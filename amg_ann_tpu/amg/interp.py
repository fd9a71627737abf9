"""Interpolation operator construction (direct interpolation + truncation).

Direct interpolation (hypre interp_type 3) for an F point i with strong
C-neighbors C_i ⊂ N_i:

    w_ij = -α_i a_ij / ã_ii   (a_ij < 0),   α_i = Σ_{k∈N_i⁻} a_ik / Σ_{j∈C_i⁻} a_ij
    w_ij = -β_i a_ij / ã_ii   (a_ij > 0),   β_i = Σ_{k∈N_i⁺} a_ik / Σ_{j∈C_i⁺} a_ij

where N_i⁻/N_i⁺ are the negative/positive off-diagonal entries. When a row
has positive off-diagonals but no positive strong C entry, those are lumped
into the diagonal (ã_ii = a_ii + Σ_{k∈N_i⁺} a_ik), hypre-style. C points
interpolate by identity. Truncation drops |w_ij| < trunc·max_j|w_ij| and
rescales to preserve row sums.
"""

from __future__ import annotations

import numpy as np

from ..sparse.csr import CSR


def direct_interpolation(a: CSR, s: CSR, cf: np.ndarray,
                         trunc_factor: float = 0.0,
                         max_per_row: int = 0) -> CSR:
    """Build P (n × n_c) from matrix a, strength graph s, C mask cf."""
    n = a.nrows
    coarse_map = np.cumsum(cf) - 1  # C index -> coarse column
    nc = int(cf.sum())

    rows, cols, vals = a.row_expand()
    offd = rows != cols
    diag = a.diagonal()

    # mark strong entries of A: membership of (i,j) in S via sorted keys.
    # Both key streams are ascending (CSR row-major, columns sorted within
    # rows), so searchsorted membership beats np.isin by ~20x.
    srows, scols, _ = s.row_expand()
    strong_keys = srows * n + scols
    entry_keys = rows * n + cols
    if strong_keys.size:
        pos = np.searchsorted(strong_keys, entry_keys)
        pos = np.minimum(pos, strong_keys.size - 1)
        is_strong = strong_keys[pos] == entry_keys
    else:
        is_strong = np.zeros(entry_keys.size, dtype=bool)

    neg = offd & (vals < 0)
    pos = offd & (vals > 0)
    strong_c = is_strong & cf[cols]
    neg_c = neg & strong_c
    pos_c = pos & strong_c

    def _rowsum(mask):
        return np.bincount(rows, weights=np.where(mask, vals, 0.0),
                           minlength=n)

    sum_all_neg = _rowsum(neg)
    sum_all_pos = _rowsum(pos)
    sum_c_neg = _rowsum(neg_c)
    sum_c_pos = _rowsum(pos_c)

    has_pos_c = sum_c_pos != 0
    # lump positive off-diagonals into the diagonal when no positive strong C
    diag_t = np.where(has_pos_c, diag, diag + sum_all_pos)
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha = np.where(sum_c_neg != 0, sum_all_neg / sum_c_neg, 0.0)
        beta = np.where(has_pos_c, sum_all_pos / sum_c_pos, 0.0)

    coef = np.where(vals < 0, alpha[rows], beta[rows])
    w = -coef * vals / diag_t[rows]

    keep = (neg_c | pos_c) & ~cf[rows] & (w != 0)
    p_rows = rows[keep]
    p_cols = coarse_map[cols[keep]]
    p_vals = w[keep]

    # identity rows for C points
    c_idx = np.flatnonzero(cf)
    p_rows = np.concatenate([p_rows, c_idx])
    p_cols = np.concatenate([p_cols, coarse_map[c_idx]])
    p_vals = np.concatenate([p_vals, np.ones(c_idx.size, dtype=a.data.dtype)])

    p = CSR.from_coo(p_rows, p_cols, p_vals.astype(a.data.dtype), (n, nc))
    if trunc_factor > 0.0 or max_per_row > 0:
        p = truncate(p, trunc_factor, max_per_row, identity_rows=cf)
    return p


def truncate(p: CSR, trunc_factor: float, max_per_row: int,
             identity_rows=None) -> CSR:
    """Drop small interpolation weights, preserving row sums (hypre-style).

    Entries with |w| < trunc_factor · max_row|w| are removed; if max_per_row
    > 0 only the largest-|w| entries per row survive. Surviving entries are
    rescaled so each row keeps its original (pos/neg separately) sums.
    """
    rows, cols, vals = p.row_expand()
    absv = np.abs(vals)
    row_max = np.zeros(p.nrows)
    np.maximum.at(row_max, rows, absv)
    keep = absv >= trunc_factor * row_max[rows]
    if identity_rows is not None:
        keep |= identity_rows[rows]

    if max_per_row > 0:
        # rank entries within each row by |w| descending
        order = np.lexsort((-absv, rows))
        r_sorted = rows[order]
        first = np.ones(r_sorted.size, dtype=bool)
        first[1:] = r_sorted[1:] != r_sorted[:-1]
        start_of_row = np.maximum.accumulate(
            np.where(first, np.arange(r_sorted.size), 0))
        rank = np.arange(r_sorted.size) - start_of_row
        keep_sorted = rank < max_per_row
        keep_rank = np.zeros(rows.size, dtype=bool)
        keep_rank[order] = keep_sorted
        keep &= keep_rank
        if identity_rows is not None:
            keep |= identity_rows[rows]

    # rescale: preserve positive and negative row sums separately
    def _sums(mask):
        spos = np.zeros(p.nrows); sneg = np.zeros(p.nrows)
        np.add.at(spos, rows[mask], np.maximum(vals[mask], 0.0))
        np.add.at(sneg, rows[mask], np.minimum(vals[mask], 0.0))
        return spos, sneg

    all_pos, all_neg = _sums(np.ones_like(keep))
    kep_pos, kep_neg = _sums(keep)
    with np.errstate(divide="ignore", invalid="ignore"):
        scale_pos = np.where(kep_pos != 0, all_pos / kep_pos, 1.0)
        scale_neg = np.where(kep_neg != 0, all_neg / kep_neg, 1.0)
    scale = np.where(vals > 0, scale_pos[rows], scale_neg[rows])
    return CSR.from_coo(
        rows[keep], cols[keep], (vals * scale)[keep], p.shape,
        sum_duplicates=False,
    )
