"""Exact order statistics by radix bisection — sort-free device medians.

The size-factor stage needs, per sample, the median of ~G log-ratios
(reference pydeseq2/preprocessing.py:59-102 runs ``np.median`` per sample).
A sort-based device median costs one bitonic sort of G per sample — the
dominant stage cost at atlas sample counts (measured 55 ms of a 288 ms
summary wall at 1000 x 30k: 1000 sorts of 30k lanes). But a median only
needs ORDER STATISTICS, and the IEEE-754 encoding of finite floats is
monotone once mapped to an unsigned integer key, so the k-th smallest value
can be found by MSB-first radix bisection: build the k-th smallest KEY one
bit at a time, where each bit costs one masked count over the data. That is
``n_bits`` elementwise passes (32 for f32) with NO sort scratch, is
embarrassingly parallel over columns, and returns the EXACT same element a
sort would (ties, infinities and NaNs included — the key map is a strict
order isomorphism with NaN above +inf, matching jnp.sort's total order).

Cost model: 32 x (G, N) compare+count passes ~ 32 reads of the operand
vs a bitonic sort's ~((log2 G)^2)/2 ~ 110 exchange stages of read+write
traffic plus gather — measured 8-10x faster at (30k, 1000) on TPU v5e and
bit-identical output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _key_info(dtype):
    if dtype == jnp.float64:
        return jnp.int64, jnp.uint64, 64
    if dtype == jnp.float32:
        return jnp.int32, jnp.uint32, 32
    raise TypeError(f"unsupported dtype {dtype}")


def _monotone_key(x: jnp.ndarray) -> jnp.ndarray:
    """Map floats to unsigned keys so that x < y  <=>  key(x) < key(y).

    Standard sign-flip trick: non-negative floats (sign bit 0) get the top
    bit set; negative floats are bitwise-complemented (reversing their
    order). POSITIVE NaNs (sign bit 0) map above +inf, so callers can encode
    "excluded" as +inf or a positive NaN and simply restrict the requested
    ranks to the valid count. CAVEAT: a NEGATIVE NaN (sign bit set — what
    arithmetic like inf-inf or 0*inf often produces) is bitwise-complemented
    and orders BELOW -inf, corrupting the rank bookkeeping. Every caller in
    this package encodes exclusions explicitly as +inf (jnp.where(mask, x,
    jnp.inf)); new callers must do the same — canonicalize computed NaNs
    first (x = jnp.where(jnp.isnan(x), jnp.inf, x)) rather than passing
    them through.
    """
    int_t, uint_t, bits = _key_info(x.dtype)
    u = jax.lax.bitcast_convert_type(x, uint_t)
    top = jnp.asarray(1, uint_t) << (bits - 1)
    return jnp.where((u & top) != 0, ~u, u | top)


def _key_to_float(key: jnp.ndarray, dtype) -> jnp.ndarray:
    int_t, uint_t, bits = _key_info(dtype)
    top = jnp.asarray(1, uint_t) << (bits - 1)
    u = jnp.where((key & top) != 0, key ^ top, ~key)
    return jax.lax.bitcast_convert_type(u, dtype)


def order_stats_select(
    x: jnp.ndarray,
    ranks: tuple[jnp.ndarray, ...],
    axis: int = 0,
    bits_per_pass: int | None = None,
) -> tuple[jnp.ndarray, ...]:
    """Exact k-th smallest elements of ``x`` along ``axis``, one per rank.

    Parameters
    ----------
    x : (..., G, ...) float32/float64 array. Entries to exclude must be
        pre-encoded as +inf or NaN (they order above every finite value);
        the requested ranks must then lie within the valid count.
    ranks : tuple of integer arrays broadcastable to the reduced shape
        (0-based ranks into the ascending order along ``axis``). All ranks
        are resolved in the SAME bisection loop — a second rank adds one
        compare per pass, not a pass.
    axis : axis to select along.
    bits_per_pass : radix width per pass. A pass resolves this many key
        bits with ``2^w - 1`` nested compares; passes = ceil(bits / w).
        None = auto: 4 when the operand is small enough that the loop is
        latency-bound (each pass is a sequential dependent step — at
        60k x 100 the 1-bit loop's 32 steps cost ~0.7 ms of latency each
        while the data is only 24 MB), else 1 (large operands are
        compute/bandwidth-bound, where fewer compares win).

    Returns
    -------
    tuple of arrays (reduced shape), the exact order-statistic values —
    bit-identical to ``jnp.sort(x, axis)[k]``.
    """
    int_t, uint_t, bits = _key_info(x.dtype)
    keys = _monotone_key(x)
    if axis != 0:
        keys = jnp.moveaxis(keys, axis, 0)
    if keys.shape[0] == 0:
        # Zero-size selection axis: every order statistic of an empty set is
        # NaN (np.median on an empty slice), and the min/max prefix reduces
        # below have no identity.
        nan = jnp.full(keys.shape[1:], jnp.nan, x.dtype)
        return tuple(nan for _ in ranks)
    # Materialize the keys once: without the barrier XLA rematerializes the
    # whole key-derivation chain (log-ratios, masking, bitcast) into EVERY
    # bisection pass when this runs inside a larger program (measured: the
    # in-program size-factor stage cost ~10x the standalone selector).
    keys = jax.lax.optimization_barrier(keys)
    if bits_per_pass is None:
        bits_per_pass = 4 if keys.size <= (1 << 24) else 1
    w = bits_per_pass
    if bits % w != 0:
        raise ValueError(f"bits_per_pass={w} must divide the key width {bits}")
    n_passes = bits // w
    red_shape = keys.shape[1:]
    ks = [jnp.broadcast_to(jnp.asarray(k, jnp.int32), red_shape) for k in ranks]
    init = tuple(jnp.zeros(red_shape, uint_t) for _ in ks)

    # Shared-prefix skip: bits where the per-column key MINIMUM and MAXIMUM
    # agree (above each column's highest differing bit) are carried by every
    # key in that column — ordering guarantees it — so the selected order
    # statistic carries them too, and the pass resolves by copying the
    # min-key's bits instead of the 2^w-1 count sweeps over the operand.
    # One min+max reduce pair over the keys (a single fused read, standard
    # reductions on every backend — a custom bitwise-AND reduction fails to
    # lower on XLA:CPU) finds the prefix; real data shares at least the
    # exponent-range prefix of the key encoding. Each pass gates on a
    # scalar lax.cond, so the skip costs ~nothing when a bit is informative.
    key_min = keys.min(axis=0)
    key_max = keys.max(axis=0)
    diff_col = key_min ^ key_max

    def body(i, Ts):
        # Resolve key bits [b, b+w) this pass (MSB-first).
        b = bits - (i + 1) * w
        seg_mask = (jnp.asarray((1 << w) - 1, uint_t)) << b

        def count_pass(Ts):
            out = []
            for T, k in zip(Ts, ks):
                best = T
                for q in range(1, 1 << w):
                    cand = T | (jnp.asarray(q, uint_t) << b)
                    # elements strictly below the candidate prefix; counts
                    # are monotone in q, so the largest feasible q wins.
                    cnt = jnp.sum(keys < cand[None], axis=0, dtype=jnp.int32)
                    best = jnp.where(cnt <= k, cand, best)
                out.append(best)
            return tuple(out)

        def skip_pass(Ts):
            return tuple(T | (key_min & seg_mask) for T in Ts)

        # In the shared prefix iff NO column has a differing bit at or above
        # position b (passes above b have then all been skipped as well, so
        # the prefix invariant holds).
        in_prefix = ~jnp.any((diff_col >> b) != 0)
        return jax.lax.cond(in_prefix, skip_pass, count_pass, Ts)

    Ts = jax.lax.fori_loop(0, n_passes, body, init)
    return tuple(_key_to_float(T, x.dtype) for T in Ts)


def trimmed_mean_select(x: jnp.ndarray, trim: float, axis: int = 0) -> jnp.ndarray:
    """Exact sort-free trimmed mean: drop ``floor(n*trim)`` at each end.

    Same semantics as the sort-slice-mean kernel (ops/stats.trimmed_mean —
    reference pydeseq2/utils.py:567-599): the two boundary order statistics
    are found by radix bisection, the interior summed directly, and
    boundary-value TIES are counted exactly (an element equal to the k-th
    smallest is included exactly as many times as its rank range overlaps
    the kept range). Only the SUMMATION ORDER differs from the sorted
    kernel (memory order vs sorted order — a ~1 ulp·sqrt(n) effect). At
    10k samples the per-column sorts are the dominant Cook's-stage cost
    (~178 bitonic stages vs ~33 count passes here).
    """
    import math

    n = x.shape[axis]
    k = math.floor(n * trim)
    if k == 0:
        return x.mean(axis)
    v_lo, v_hi = order_stats_select(x, (k, n - 1 - k), axis=axis)
    xm = jnp.moveaxis(x, axis, 0)
    lo = v_lo[None]
    hi = v_hi[None]
    strict = jnp.where((xm > lo) & (xm < hi), xm, 0.0).sum(0)
    c_le_lo = (xm <= lo).sum(0)
    c_lt_hi = (xm < hi).sum(0)
    # kept ranks are [k, n-1-k]; copies of the boundary values inside it:
    copies_lo = (c_le_lo - k).astype(x.dtype)
    copies_hi = (n - k - c_lt_hi).astype(x.dtype)
    total = strict + v_lo * copies_lo + v_hi * copies_hi
    mean = total / (n - 2 * k)
    return jnp.where(v_lo == v_hi, v_lo, mean)


def masked_median_select(
    values: jnp.ndarray, n_valid: jnp.ndarray, axis: int = 0
) -> jnp.ndarray:
    """Median over the valid entries of ``values`` along ``axis``.

    ``values`` must hold +inf (or NaN) at excluded entries and ``n_valid``
    the per-column count of valid ones (broadcastable to the reduced
    shape). Averages the two middle order statistics exactly like
    ``np.median`` / the sort-gather kernels this replaces; columns with
    ``n_valid == 0`` return NaN.
    """
    n_valid = jnp.asarray(n_valid, jnp.int32)
    k_lo = jnp.maximum((n_valid - 1) // 2, 0)
    k_hi = n_valid // 2
    v_lo, v_hi = order_stats_select(values, (k_lo, k_hi), axis=axis)
    med = (v_lo + v_hi) / 2.0
    return jnp.where(n_valid > 0, med, jnp.nan)
