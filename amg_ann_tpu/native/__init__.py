"""Native (C++) host kernels, loaded via ctypes.

Build is lazy: first import compiles `csparse.cpp` with g++ into the package
directory (cached by source mtime). If no compiler is available the callers
fall back to numpy/scipy implementations.
"""

from .build import load_csparse
