"""Batched small-block dense linear algebra in pure arithmetic.

XLA:TPU implements LuDecomposition only for f32/c64, so
``jnp.linalg.inv``/``solve`` on the f64 field-coupling blocks (f x f with
f <= 9) fail to compile on device.  These routines implement Gauss-Jordan
elimination with partial pivoting using only elementwise ops, selects and
static-index updates — compiles and runs in f64 on TPU, and is faster than
a general LU for these tiny blocks anyway (fully unrolled, batch-parallel
on the VPU).
"""

from __future__ import annotations

import jax.numpy as jnp

# Exponent-range guard.  XLA:TPU emulates f64 with float32 pairs, which
# keeps ~f32 EXPONENT range (~1e+-38): a near-singular block during a
# Newton excursion can push a pivot inverse past it, and the resulting
# overflow in emulated-f64 intermediates kernel-faults the TPU worker
# (BASELINE config 1's 500-step schedule, docs/TPU_NOTES.md round 4-5).
# Every factorization magnitude is clamped to +-RANGE_LIM and pivots are
# floored at RANGE_FLOOR, so no product of two clamped quantities (times
# block size <= 16) can reach 1e38: 1e16 * 1e16 * 16 ~ 1.6e33.  Both
# bounds sit ~1e6+ beyond any legitimate quantity in this framework's
# scaled systems, so healthy solves are numerically unchanged; where a
# clamp does engage, the direction is certified downstream (Newton
# accepts on the true f64 residual; the mixed-precision direct paths
# additionally polish with f64 GMRES, correcting any clamped pivot).
RANGE_LIM = 1.0e16
RANGE_FLOOR = 1.0e-16


def range_clamp(x: jnp.ndarray, lim: float = RANGE_LIM) -> jnp.ndarray:
    """Clamp magnitudes into the TPU-emulated-f64 exponent budget."""
    return jnp.clip(x, -lim, lim)


def _floor_pivot(pivval: jnp.ndarray) -> jnp.ndarray:
    """Push a ~zero pivot to +-RANGE_FLOOR, keeping its sign (sign(0)
    counts as +)."""
    neg = pivval < 0
    floored = jnp.where(neg, -RANGE_FLOOR, RANGE_FLOOR)
    return jnp.where(jnp.abs(pivval) < RANGE_FLOOR, floored, pivval)


def block_inv(A: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of (..., f, f) via Gauss-Jordan with partial
    pivoting.  f is static and small (<= ~16)."""
    f = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(f, dtype=A.dtype), A.shape)
    aug = jnp.concatenate([range_clamp(A), eye], axis=-1)   # (..., f, 2f)
    rows = jnp.arange(f, dtype=jnp.int32)

    for k in range(f):
        # partial pivot: largest |entry| in column k among rows >= k.
        # The pivot row is tracked as a ONE-HOT vector h (first occurrence
        # of the max), never as an integer index: argmax/take_along_axis
        # produce int64 indices under x64 and dynamic gathers, both of
        # which Mosaic rejects inside Pallas kernels.  The row swap
        # k <-> p becomes a boolean permutation matrix multiply-reduce.
        col = jnp.abs(aug[..., :, k])
        col = jnp.where(rows >= k, col, -jnp.inf)
        mx = jnp.max(col, axis=-1, keepdims=True)
        is_mx = col == mx
        # first occurrence of the max: no is_mx strictly before j
        # (strictly-lower-triangular mask sum, not cumsum — cumsum has no
        # Pallas TPU lowering)
        lt = (rows[:, None] < rows[None, :]).astype(A.dtype)
        before = jnp.sum(is_mx[..., :, None].astype(A.dtype) * lt, axis=-2)
        h = is_mx & (before == 0)
        # perm[i, j] = h[j]        if i == k      (row k receives row p)
        #            = (j == k)    if h[i]        (row p receives row k)
        #            = (i == j)    otherwise
        i_is_k = (rows == k)[..., :, None]
        j_is_k = (rows == k)[..., None, :]
        eye_ij = (rows[..., :, None] == rows[..., None, :])
        perm = jnp.where(i_is_k, h[..., None, :],
                         jnp.where(h[..., :, None], j_is_k, eye_ij))
        aug = jnp.sum(perm.astype(aug.dtype)[..., :, :, None]
                      * aug[..., None, :, :], axis=-2)
        # normalize pivot row, eliminate everywhere else.  The pivot is
        # floored and the row/update magnitudes clamped so near-singular
        # blocks stay inside the emulated-f64 exponent range (see the
        # RANGE_LIM note above).
        pivval = _floor_pivot(aug[..., k, k])[..., None, None]
        rowk = range_clamp(aug[..., k:k + 1, :] / pivval)
        factors = aug[..., :, k:k + 1]
        aug = range_clamp(aug - factors * rowk)
        # restore the (zeroed) pivot row as the normalized row
        aug = _set_row(aug, k, rowk[..., 0, :])

    return aug[..., :, f:]


def _set_row(aug, k, row):
    f = aug.shape[-2]
    mask = (jnp.arange(f, dtype=jnp.int32) == k)[:, None]
    return jnp.where(mask, row[..., None, :], aug)


def block_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched solve A x = b for (..., f, f) blocks.

    b: (..., f) or (..., f, k).  Uses the explicit GJ inverse — for the
    tiny, backward-Euler-shifted blocks of this framework the
    inverse-multiply is accurate to ~1e-14 relative and maps better onto
    the TPU than a triangular-solve chain.
    """
    Ainv = block_inv(A)
    if b.ndim == A.ndim - 1:
        return jnp.einsum("...ij,...j->...i", Ainv, b)
    return Ainv @ b


def triangular_solve_upper(R: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Back-substitution for a single upper-triangular system (m static).

    Replaces jax.scipy.linalg.solve_triangular (TriangularSolve is not
    available for f64 on TPU)."""
    m = R.shape[-1]
    x = jnp.zeros_like(g)
    for i in range(m - 1, -1, -1):
        resid = g[i] - jnp.dot(R[i, :], x)
        x = x.at[i].set(resid / R[i, i])
    return x
