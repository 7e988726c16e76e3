"""Linear assignment (Hungarian) solver in pure JAX.

The reference's DETR HungarianMatcher ships the cost matrix to the host and
calls ``scipy.optimize.linear_sum_assignment`` per image
(reference models/utils/ops.py:112). A host round-trip per train step defeats
the jitted TPU pipeline, so this is the same exact algorithm — shortest
augmenting path with dual potentials, the rectangular LSAP algorithm scipy
implements — written with ``lax.while_loop``/``fori_loop`` so it runs under
jit and vmaps over the batch.

Fixed-shape convention: rows are (padded) GT slots, columns are queries.
Padded rows are given a constant cost over all columns — a constant row is
indifferent to its column, so the joint optimum restricted to the valid rows
is an optimal assignment of the valid rows (there are always more columns
than rows here: nq=300 >= max_boxes). Tie-breaking prefers an unassigned
column, then the lowest index; degenerate-tie choices may differ from scipy
but the assignment cost is exactly optimal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_INF = jnp.float32(1e30)


def _lsa_single(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact LAP for one (M, N) cost matrix, M <= N. Returns col4row (M,) int32:
    the column assigned to each row. Minimizes total cost."""
    m, n = cost.shape
    cost = jnp.nan_to_num(cost.astype(jnp.float32), nan=0.0, posinf=0.0, neginf=0.0)

    def outer(cur_row, carry):
        u, v, row4col, col4row = carry

        # -- Dijkstra for the shortest augmenting path from cur_row ----------
        def dj_cond(st):
            return ~st[0]

        def dj_body(st):
            _, i, min_val, spc, path, sr, remaining, sink = st
            sr = sr.at[i].set(True)
            r = min_val + cost[i] - u[i] - v  # (N,) reduced path costs
            better = remaining & (r < spc)
            spc = jnp.where(better, r, spc)
            path = jnp.where(better, i, path)

            masked = jnp.where(remaining, spc, _INF)
            lowest = masked.min()
            tie = remaining & (masked == lowest)
            tie_free = tie & (row4col == -1)  # prefer an unassigned column
            pick = jnp.where(tie_free.any(), tie_free, tie)
            j = jnp.argmax(pick)

            is_sink = row4col[j] == -1
            sink = jnp.where(is_sink, j, sink)
            i_next = jnp.where(is_sink, i, row4col[j])
            remaining = remaining.at[j].set(False)
            return (is_sink, i_next, lowest, spc, path, sr, remaining, sink)

        st0 = (
            jnp.bool_(False), cur_row, jnp.float32(0.0),
            jnp.full((n,), _INF), jnp.zeros((n,), jnp.int32),
            jnp.zeros((m,), bool), jnp.ones((n,), bool), jnp.int32(0),
        )
        _, _, min_val, spc, path, sr, remaining, sink = lax.while_loop(
            dj_cond, dj_body, st0
        )

        # -- dual updates (keep reduced costs consistent) ---------------------
        u = u.at[cur_row].add(min_val)
        others = sr & (jnp.arange(m) != cur_row)
        ci = jnp.clip(col4row, 0, n - 1)  # rows in sr-{cur_row} are assigned
        u = u + jnp.where(others, min_val - spc[ci], 0.0)
        sc = ~remaining  # scanned columns
        v = v + jnp.where(sc, spc - min_val, 0.0)

        # -- augment along the stored path ------------------------------------
        def au_cond(st):
            return ~st[0]

        def au_body(st):
            _, sink, row4col, col4row = st
            i = path[sink]
            row4col = row4col.at[sink].set(i)
            nxt = col4row[i]
            col4row = col4row.at[i].set(sink)
            return (i == cur_row, nxt, row4col, col4row)

        _, _, row4col, col4row = lax.while_loop(
            au_cond, au_body, (jnp.bool_(False), sink, row4col, col4row)
        )
        return (u, v, row4col, col4row)

    u0 = jnp.zeros((m,), jnp.float32)
    v0 = jnp.zeros((n,), jnp.float32)
    row4col0 = jnp.full((n,), -1, jnp.int32)
    col4row0 = jnp.full((m,), -1, jnp.int32)
    _, _, _, col4row = lax.fori_loop(0, m, outer, (u0, v0, row4col0, col4row0))
    return col4row


def linear_sum_assignment(cost: jnp.ndarray, row_mask: jnp.ndarray | None = None):
    """Batched exact LAP. cost (B, M, N) with M <= N; row_mask (B, M) marks
    valid rows (padded rows get a constant cost and are assigned arbitrary,
    distinct columns that never distort the valid rows' optimum).

    Returns col4row (B, M) int32 — the column index matched to each row.
    """
    if cost.ndim == 2:
        cost = cost[None]
        if row_mask is not None:
            row_mask = row_mask[None]
        return linear_sum_assignment(cost, row_mask)[0]
    if row_mask is not None:
        cost = jnp.where(row_mask[..., None] > 0, cost, 0.0)
    return jax.vmap(_lsa_single)(cost)
