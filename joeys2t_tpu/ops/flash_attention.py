# coding: utf-8
"""
First-party Pallas TPU flash attention (forward + custom VJP backward).

Replaces the einsum attention's HBM-materialized (B, H, S, S) score tensor
for long sequences — the encoder self-attention over up-to-1500 post-subsample
audio frames is the training hot path (SURVEY.md §3.1).

Layout: operands are the model's FLAT projections (B, S, E) with E = H*D —
exactly what the QKV Dense layers produce. The round-2 kernel took
(B, H, S, D) and the transposes around every call measured ~15ms/step of
layout copies in the flagship train profile; a first round-3 rework took
(B, S, H, D) but the head-split reshape still forced a tile change
(T(8,128) -> T(4,128)) costing ~0.1ms per operand per layer (~10ms/step
of "data formatting"). The flat layout removes ALL reshapes: heads are
static 128-aligned column bands of the E dim, sliced for free inside
VMEM. Programs are also batch-blocked (BB rows per program) so the
per-program fixed overhead (~4us) is amortized at short S:

  grid (B/BB, S/BLOCK_Q):  per row r, head h (static unroll):
    S_blk = Q_blk[r][:, hD:hD+D] K[r][:, hD:hD+D]^T * scale + bias
    P_blk = softmax(S_blk)                          (VPU, f32)
    O_blk[r][:, hD:hD+D] = P_blk V[r][:, hD:hD+D]   (MXU)

The forward also emits the per-row logsumexp; the backward consumes
(out, lse) residuals — no forward re-run — rebuilding P per block as
exp(s - lse) and accumulating dK/dV across the sequential q-block grid dim.

Falls back transparently: `flash_attention` is jit-differentiable and matches
the einsum reference to ~1e-5 (tests/test_flash_attention.py runs it in
interpreter mode on CPU).
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _block_q(s_padded: int) -> int:
    """Query block: 256 for short sequences (typical post-subsample audio
    S<=512 runs as ONE program per batch row), 128 beyond — at BQ=256 and
    long S the per-head (BQ, S) f32 score tiles (1MB x H unrolled heads)
    pressure VMEM and measured slower at S=1024."""
    return 256 if (s_padded <= 512 and s_padded % 256 == 0) else 128


def _row_seed(seed_ref, r: int, bb: int, h: int, num_heads: int):
    """Distinct PRNG stream per (batch row, q-block, head). Keyed to the
    ABSOLUTE batch row (grid row * static batch block + r) so forward and
    backward regenerate identical masks even when they use different batch
    blocks (the backward's f32 dK/dV accumulators halve its VMEM budget)."""
    row = pl.program_id(0) * bb + r
    flat = row * pl.num_programs(1) + pl.program_id(1)
    return seed_ref[0, 0] + flat * num_heads + h


def _dropout_mask(shape, rate: float):
    """Keep mask from the per-core PRNG; caller must have seeded it."""
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(min(max(rate, 0.0), 1.0) * 4294967295.0)
    return pltpu.bitcast(bits, jnp.uint32) >= threshold


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                sm_scale, dropout_rate, num_heads, bb):
    d = q_ref.shape[-1] // num_heads
    for r in range(bb):  # static unroll over the program's batch rows
        bias = bias_ref[r, 0]  # (S,)
        for h in range(num_heads):  # static unroll; H is 4-16
            # column band of the E dim: free when d % 128 == 0; at d=64
            # Mosaic handles the half-lane offset with a relayout that
            # still beats the per-head (B,H,S,D) kernels 2x at short S
            # (measured on v5e: flat 0.46/3.9 ms/layer fwd / f+b vs
            # bhsd 0.80/8.4 at B=64, S=256, E=512, H=8)
            hs = slice(h * d, (h + 1) * d)
            qh = q_ref[r, :, hs].astype(jnp.float32) * sm_scale  # (BQ, D)
            s = jax.lax.dot_general(
                qh, k_ref[r, :, hs].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (BQ, S)
            s = s + bias[None, :]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = p / l
            # per-row logsumexp residual: the backward rebuilds normalized
            # probabilities as exp(s - lse) without re-deriving max/sum
            lse_ref[r, :, h] = (m + jnp.log(l))[:, 0]
            if dropout_rate > 0.0:
                pltpu.prng_seed(_row_seed(seed_ref, r, bb, h, num_heads))
                keep = _dropout_mask(p.shape, dropout_rate)
                p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
            v = v_ref[r, :, hs]
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[r, :, hs] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref,
                lse_ref, dq_ref, dk_ref, dv_ref, *, sm_scale, dropout_rate,
                num_heads, bb):
    qi = pl.program_id(1)
    d = q_ref.shape[-1] // num_heads

    @pl.when(qi == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    for r in range(bb):
        bias = bias_ref[r, 0]
        for h in range(num_heads):
            hs = slice(h * d, (h + 1) * d)
            q = q_ref[r, :, hs].astype(jnp.float32) * sm_scale  # (BQ, D)
            k = k_ref[r, :, hs].astype(jnp.float32)  # (S, D)
            v = v_ref[r, :, hs].astype(jnp.float32)
            do = do_ref[r, :, hs].astype(jnp.float32)  # (BQ, D)
            o = o_ref[r, :, hs].astype(jnp.float32)
            lse = lse_ref[r, :, h]  # (BQ,)
            delta = jnp.sum(do * o, axis=-1)  # (BQ,) rowsum(do * o_dropped)

            s = jax.lax.dot_general(q, k,
                                    dimension_numbers=(((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + bias[None, :]
            p = jnp.exp(s - lse[:, None])  # normalized probs via stored lse

            dp = jax.lax.dot_general(do, v,
                                     dimension_numbers=(((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if dropout_rate > 0.0:
                # regenerate the forward's dropout mask (same seed stream)
                pltpu.prng_seed(_row_seed(seed_ref, r, bb, h, num_heads))
                keep = _dropout_mask(p.shape, dropout_rate)
                dp_eff = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)
                p_dropped = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
            else:
                dp_eff = dp
                p_dropped = p
            # delta == rowsum(p_dropped * dp) for the dropped forward, so
            # the softmax-backward identity holds with dp_eff in place of dp
            ds = p * (dp_eff - delta[:, None])  # (BQ, S)

            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * sm_scale
            dq_ref[r, :, hs] = dq.astype(dq_ref.dtype)

            # accumulate dk/dv across the (sequential) q-block grid dim
            # (q is already sm_scale-scaled above: dk needs no extra factor)
            dk = jax.lax.dot_general(ds, q,
                                     dimension_numbers=(((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dv = jax.lax.dot_general(p_dropped, do,
                                     dimension_numbers=(((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dk_ref[r, :, hs] += dk.astype(dk_ref.dtype)
            dv_ref[r, :, hs] += dv.astype(dv_ref.dtype)


LONG_S = 512  # beyond this, dispatch to the (B, H, S, D) kernels below


def _program_seed3(seed_ref):
    """Distinct PRNG stream per 3-D-grid program (BHSD kernels)."""
    flat = (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)) \
        * pl.num_programs(2) + pl.program_id(2)
    return seed_ref[0, 0] + flat


def _fwd_kernel_bhsd(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                     *, sm_scale, dropout_rate):
    """Long-sequence variant on (B, H, S, D) blocks: one (batch, head,
    q-block) per program, contiguous (S, D) K/V tiles. At S > ~512 the
    native-layout kernel's per-head strided slices of the (S, H, D) slab
    dominate (measured 23-30ms vs 14.8ms at S=1024); here the transposes
    happen ONCE outside the kernel instead."""
    q = q_ref[0, 0].astype(jnp.float32) * sm_scale  # (BQ, D)
    k = k_ref[0, 0]  # (S, D)
    v = v_ref[0, 0]
    bias = bias_ref[0, 0]  # (S,)

    s = jax.lax.dot_general(
        q, k.astype(jnp.float32), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BQ, S)
    s = s + bias[None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    lse_ref[0, 0] = m + jnp.log(l)  # (BQ, 1): trailing singleton for Mosaic
    if dropout_rate > 0.0:
        pltpu.prng_seed(_program_seed3(seed_ref))
        keep = _dropout_mask(p.shape, dropout_rate)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel_bhsd(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref,
                     lse_ref, dq_ref, dk_ref, dv_ref, *, sm_scale,
                     dropout_rate):
    qi = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32) * sm_scale
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    bias = bias_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)  # (BQ, D)
    o = o_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # (BQ, 1)
    delta = jnp.sum(do * o, axis=-1)  # (BQ,) rowsum(do * o_dropped)

    s = jax.lax.dot_general(q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias[None, :]
    p = jnp.exp(s - lse)  # normalized probs via the stored lse (BQ, S)

    dp = jax.lax.dot_general(do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        pltpu.prng_seed(_program_seed3(seed_ref))
        keep = _dropout_mask(p.shape, dropout_rate)
        dp_eff = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)
        p_dropped = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    else:
        dp_eff = dp
        p_dropped = p
    ds = p * (dp_eff - delta[:, None])  # (BQ, S)

    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * sm_scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    dk = jax.lax.dot_general(ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dv = jax.lax.dot_general(p_dropped, do,
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += dk.astype(dk_ref.dtype)
    dv_ref[0, 0] += dv.astype(dv_ref.dtype)


def _flash_fwd_bhsd(qt, kt, vt, bias, sm_scale, dropout_rate, seed):
    """qt/kt/vt are (B, H, S, D) transposed views. Returns (out_bhsd, lse)
    with lse (B, H, Sq_padded, 1)."""
    b, h, sq, d = qt.shape
    sk = kt.shape[2]
    pad = (-sq) % 128
    if pad:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad), (0, 0)))
    n_q = qt.shape[2] // 128
    grid = (b, h, n_q)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_bhsd, sm_scale=sm_scale,
                          dropout_rate=dropout_rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 128, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qt.shape, qt.dtype),
            jax.ShapeDtypeStruct((b, h, qt.shape[2], 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(_seed_arr(seed), qt, kt, vt, bias[:, None, :])
    return out[:, :, :sq], lse


def _flash_bwd_bhsd(qt, kt, vt, bias, seed, ot, lse, dot_, sm_scale,
                    dropout_rate):
    """BHSD backward; all operands already transposed. Returns BHSD grads."""
    b, h, sq, d = qt.shape
    sk = kt.shape[2]
    pad = (-sq) % 128

    def padq(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else x

    q_p, do_p, o_p = padq(qt), padq(dot_), padq(ot)
    n_q = q_p.shape[2] // 128
    grid = (b, h, n_q)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_bhsd, sm_scale=sm_scale,
                          dropout_rate=dropout_rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 128, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q_p.shape, qt.dtype),
            jax.ShapeDtypeStruct(kt.shape, jnp.float32),
            jax.ShapeDtypeStruct(vt.shape, jnp.float32),
        ],
        interpret=_interpret(),
    )(_seed_arr(seed), q_p, kt, vt, bias[:, None, :], do_p, o_p, lse)
    return dq[:, :, :sq], dk, dv


def _pad_q3(x, block):
    """Pad the (B, S, E) query-length dim up to a block multiple."""
    s = x.shape[1]
    pad = (-s) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_flat(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         bias: jnp.ndarray, sm_scale: float, num_heads: int,
                         dropout_rate: float = 0.0,
                         seed: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Attention over full K/V with additive key bias, FLAT head layout.

    :param q: (B, Sq, E) with E = num_heads * head_dim — exactly the QKV
        Dense outputs; heads are contiguous 128-aligned column bands, so no
        head-split reshape (and no tile change) ever materializes
    :param k,v: (B, Sk, E)
    :param bias: (B, Sk) float32 additive mask (0 valid / -1e9 masked)
    :param sm_scale: softmax scale (1/sqrt(head_dim))
    :param num_heads: static head count (head_dim = E // num_heads)
    :param dropout_rate: attention-prob dropout (in-kernel PRNG; the backward
        pass regenerates the identical mask from the same seed)
    :param seed: int32 scalar array seeding the in-kernel PRNG (required when
        dropout_rate > 0)
    :return: (B, Sq, E) in q's dtype
    """
    out, _ = _flash_fwd(q, k, v, bias, sm_scale, num_heads, dropout_rate,
                        seed)
    return out


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: jnp.ndarray, sm_scale: float,
                    dropout_rate: float = 0.0,
                    seed: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B, S, H, D)-layout adapter over :func:`flash_attention_flat`.

    Kept for tests and head-shaped callers; the hot model path passes the
    flat Dense outputs directly (`mha_flash_flat`) so the reshape here
    never appears in the training graph."""
    b, sq, h, d = q.shape
    out = flash_attention_flat(
        q.reshape(b, sq, h * d), k.reshape(k.shape[0], k.shape[1], h * d),
        v.reshape(v.shape[0], v.shape[1], h * d), bias, sm_scale, h,
        dropout_rate, seed)
    return out.reshape(b, sq, h, d)


def _seed_arr(seed):
    if seed is None:
        return jnp.zeros((1, 1), jnp.int32)
    return jnp.asarray(seed, jnp.int32).reshape(1, 1)


def _reference_attention(q, k, v, bias, sm_scale, num_heads, dropout_rate,
                         seed):
    """Plain-jnp path used off-TPU when dropout is active (the in-kernel PRNG
    primitives only lower on TPU). Same math on the flat layout,
    jax.random-generated mask."""
    b, sq, e = q.shape
    d = e // num_heads
    qh = q.reshape(b, sq, num_heads, d)
    kh = k.reshape(b, k.shape[1], num_heads, d)
    vh = v.reshape(b, v.shape[1], num_heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                   kh.astype(jnp.float32)) * sm_scale
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.int32).reshape(()))
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, vh.astype(jnp.float32))
    return out.reshape(b, sq, e).astype(q.dtype)


_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_bb(b: int, bq: int, sk: int, e: int, itemsize: int,
             bwd: bool) -> int:
    """Batch rows per program: as many as divide B and fit the VMEM budget.
    Every HBM-backed block is DOUBLE-buffered by the Pallas pipeline (the
    next grid step's copy overlaps compute), so block bytes count 2x — the
    r3 TPU run confirmed: bb=8 at (bq=256, sk=256, e=512, bf16) allocated
    18MB against a 16MB scoped-vmem limit, exactly 2x the naive estimate.
    The backward carries f32 dK/dV accumulators (+ dO/O/dQ blocks), so its
    per-row footprint is ~3x the forward's."""
    per_row = 2 * (2 * bq + 2 * sk) * e * itemsize  # (q,o + k,v) x dbl-buf
    if bwd:
        # do,o,dq blocks + f32 dk,dv accumulators, all double-buffered
        per_row += 2 * (3 * bq * e * itemsize + 2 * sk * e * 4)
    scores = bq * sk * 4 * 2  # f32 score + grad tiles (live one head at a time)
    for bb in (8, 4, 2, 1):
        if b % bb == 0 and bb * per_row + scores <= _VMEM_BUDGET:
            return bb
    return 1


def _flat_fits_bwd(sq: int, sk: int, e: int, itemsize: int) -> bool:
    """Whether the FLAT backward kernel fits VMEM at bb=1.

    Wide models (e.g. hidden 1024+ at S<=512) pass the K+V-slab check but
    the backward's dO/O/dQ blocks + f32 dK/dV accumulators blow the
    scoped-VMEM limit — Mosaic then fails to compile instead of falling
    back (measured: hidden 1024/2048 fwd compiles, bwd does not). Both
    _flash_fwd and _flash_bwd dispatch to the per-head (B, H, S, D)
    kernels when this is False, so the residual layouts always agree."""
    bq = _block_q(sq if sq % 128 == 0 else sq + (-sq) % 128)
    per_row = (2 * (2 * bq + 2 * sk) * e * itemsize
               + 2 * (3 * bq * e * itemsize + 2 * sk * e * 4))
    scores = bq * sk * 4 * 2
    return per_row + scores <= _VMEM_BUDGET


def _flash_fwd(q, k, v, bias, sm_scale, num_heads, dropout_rate, seed):
    if dropout_rate > 0.0 and _interpret():
        out = _reference_attention(q, k, v, bias, sm_scale, num_heads,
                                   dropout_rate, seed)
        return out, (q, k, v, bias, seed, None, None)
    b, sq, e = q.shape
    h, d = num_heads, e // num_heads
    sk = k.shape[1]
    if sk > LONG_S or not _flat_fits_bwd(sq, sk, e,
                                         jnp.dtype(q.dtype).itemsize):
        # long sequences: split heads + transpose ONCE, run the (B, H, S, D)
        # kernels — at S > 512 the per-head strided reads of a flat slab
        # lose to a one-time layout change (measured at S=1024). Wide
        # models whose FLAT backward would not fit VMEM take the same
        # route (see _flat_fits_bwd).
        def hd(x):
            return jnp.swapaxes(
                x.reshape(x.shape[0], x.shape[1], h, d), 1, 2)
        out_t, lse = _flash_fwd_bhsd(hd(q), hd(k), hd(v), bias, sm_scale,
                                     dropout_rate, seed)
        out = jnp.swapaxes(out_t, 1, 2).reshape(b, sq, e)
        return out, (q, k, v, bias, seed, out, lse)
    bq = _block_q(sq if sq % 128 == 0 else sq + (-sq) % 128)
    q_p, sq_orig = _pad_q3(q, bq)
    n_q = q_p.shape[1] // bq
    bb = _pick_bb(b, bq, sk, e, jnp.dtype(q.dtype).itemsize, bwd=False)

    grid = (b // bb, n_q)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale,
                          dropout_rate=dropout_rate, num_heads=h, bb=bb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, qi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, bq, e), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, sk, e), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, sk, e), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, sk), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, bq, e), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            # lse (B, Sq, H): last two block dims (bq, h) = (8k, array dim)
            pl.BlockSpec((bb, bq, h), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q_p.shape, q.dtype),
            jax.ShapeDtypeStruct((b, q_p.shape[1], h), jnp.float32),
        ],
        interpret=_interpret(),
    )(_seed_arr(seed), q_p, k, v, bias[:, None, :])
    out = out[:, :sq_orig]
    # residuals: out + per-row logsumexp, so the backward pass never re-runs
    # the forward kernel (VERDICT r2 weak #2); lse stays padded to the block
    return out, (q, k, v, bias, seed, out, lse)


def _flash_bwd(sm_scale, num_heads, dropout_rate, res, do):
    q, k, v, bias, seed, o, lse = res
    if dropout_rate > 0.0 and _interpret():
        _, vjp = jax.vjp(
            lambda q, k, v: _reference_attention(
                q, k, v, bias, sm_scale, num_heads, dropout_rate, seed),
            q, k, v)
        dq, dk, dv = vjp(do)
        return dq, dk, dv, None, None
    b, sq, e = q.shape
    h, d = num_heads, e // num_heads
    sk = k.shape[1]
    if sk > LONG_S or not _flat_fits_bwd(sq, sk, e,
                                         jnp.dtype(q.dtype).itemsize):
        # same dispatch condition as _flash_fwd: the lse/out residuals in
        # this branch came from the (B, H, S, D) forward kernels
        def hd(x):
            return jnp.swapaxes(
                x.reshape(x.shape[0], x.shape[1], h, d), 1, 2)

        def flat(x):
            return jnp.swapaxes(x, 1, 2).reshape(x.shape[0], x.shape[2], e)
        dq, dk, dv = _flash_bwd_bhsd(hd(q), hd(k), hd(v), bias, seed, hd(o),
                                     lse, hd(do), sm_scale, dropout_rate)
        return (flat(dq).astype(q.dtype), flat(dk).astype(k.dtype),
                flat(dv).astype(v.dtype), None, None)
    bq = _block_q(sq if sq % 128 == 0 else sq + (-sq) % 128)

    q_p, sq_orig = _pad_q3(q, bq)
    do_p, _ = _pad_q3(do, bq)
    o_p, _ = _pad_q3(o, bq)
    n_q = q_p.shape[1] // bq
    bb = _pick_bb(b, bq, sk, e, jnp.dtype(q.dtype).itemsize, bwd=True)
    grid = (b // bb, n_q)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale,
                          dropout_rate=dropout_rate, num_heads=h, bb=bb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, qi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, bq, e), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, sk, e), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, sk, e), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, sk), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bq, e), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bq, e), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bq, h), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, bq, e), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            # dk/dv blocks are revisited across qi (sequential TPU grid)
            pl.BlockSpec((bb, sk, e), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, sk, e), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q_p.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ],
        interpret=_interpret(),
    )(_seed_arr(seed), q_p, k, v, bias[:, None, :], do_p, o_p, lse)

    dq = dq[:, :sq_orig]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None, None


flash_attention_flat.defvjp(_flash_fwd, _flash_bwd)


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (tests on the CPU mesh)."""
    return jax.default_backend() not in ("tpu",)


def supported(sq: int, sk: int, d: int, dtype, num_heads: int = 4) -> bool:
    """Whether the kernel path applies (alignment + VMEM slab budget).

    Unaligned sk is padded internally (masked via the bias). The budget
    must match the kernel that will actually run: sk <= LONG_S stages
    all-heads flat K+V slabs per batch row; sk > LONG_S dispatches to the
    (B, H, S, D) kernels whose slabs are per-head (sk, d) — so long
    sources are gated on the per-head slab, not the flat one."""
    if d % 64 != 0 or d > 256:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    sk_pad = sk + (-sk) % 128  # mha_flash_flat pads keys to a lane multiple
    e = num_heads * d
    if sk_pad <= LONG_S and _flat_fits_bwd(sq, sk_pad, e, itemsize):
        # FLAT kernels: all-heads K+V slab per batch row
        if 2 * sk_pad * e * itemsize > 8 * 1024 * 1024:
            return False
    else:
        # (B, H, S, D) kernels (long sources, or wide models whose flat
        # backward exceeds VMEM): per-head slabs, double-buffered
        if 4 * sk_pad * d * itemsize > 8 * 1024 * 1024:
            return False
    return dtype in (jnp.float32, jnp.bfloat16)


def _key_bias(key_valid, b, sk):
    if key_valid is None:
        return jnp.zeros((b, sk), jnp.float32)
    return jnp.where(key_valid, 0.0, NEG_INF).astype(jnp.float32)


def mha_flash_flat(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   num_heads: int, key_valid: Optional[jnp.ndarray],
                   sm_scale: float, dropout_rate: float = 0.0,
                   seed: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Adapter from the model's FLAT (B, T, E) QKV projections + bool key
    mask — the zero-reshape hot path. Pads the key length up to a
    lane-aligned multiple of 128 (padded keys masked through the bias)."""
    b, sk = k.shape[0], k.shape[1]
    bias = _key_bias(key_valid, b, sk)
    pad = (-sk) % 128
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=NEG_INF)
    return flash_attention_flat(q, k, v, bias, sm_scale, num_heads,
                                dropout_rate, seed)


def mha_flash(q_heads: jnp.ndarray, k_heads: jnp.ndarray, v_heads: jnp.ndarray,
              key_valid: Optional[jnp.ndarray], sm_scale: float,
              dropout_rate: float = 0.0,
              seed: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B, T, H, D)-layout adapter (tests / head-shaped callers)."""
    b, sq, h, d = q_heads.shape
    out = mha_flash_flat(
        q_heads.reshape(b, sq, h * d),
        k_heads.reshape(b, k_heads.shape[1], h * d),
        v_heads.reshape(b, v_heads.shape[1], h * d),
        h, key_valid, sm_scale, dropout_rate, seed)
    return out.reshape(b, sq, h, d)


def _flash_shard_specs(mesh, b: int, h: int):
    """PartitionSpecs for flat (B, T, E) activations on the (data, model)
    mesh, or None when the shapes don't divide the mesh axes. Sharding E
    over `model` splits whole heads as long as tp divides H (each shard
    holds H/tp contiguous 128-wide head bands — the Megatron column-parallel
    QKV layout from parallel/tp.py)."""
    from jax.sharding import PartitionSpec as P

    dp = mesh.shape.get("data", 1)
    tp = mesh.shape.get("model", 1)
    if b % dp != 0 or h % tp != 0:
        return None
    e_axis = "model" if tp > 1 else None
    return {
        "qkv": P("data", None, e_axis),
        "mask": P("data", None),
        "out": P("data", None, e_axis),
    }


def mha_flash_sharded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      num_heads: int,
                      key_valid: Optional[jnp.ndarray], sm_scale: float,
                      dropout_rate: float = 0.0,
                      seed: Optional[jnp.ndarray] = None) -> Optional[jnp.ndarray]:
    """mha_flash_flat under GSPMD: explicitly shard_map the kernel over the
    installed default mesh (batch over `data`, head bands of E over `model`
    — the Megatron attention layout from parallel/tp.py), so
    `attn_impl='auto'` keeps the flash kernel active in sharded training
    instead of falling back to the einsum path (VERDICT r1 item 3). Pallas
    calls have no SPMD partitioning rule, so without this wrapper the
    partitioner would replicate them. Returns None when no mesh is
    installed or the shapes don't divide the mesh (caller falls back)."""
    from joeys2t_tpu.parallel.mesh import get_default_mesh

    ctx = get_default_mesh()
    if ctx is None:
        return None
    mesh = ctx.mesh
    if mesh.size == 1:
        return mha_flash_flat(q, k, v, num_heads, key_valid, sm_scale,
                              dropout_rate, seed)
    b = q.shape[0]
    specs = _flash_shard_specs(mesh, b, num_heads)
    if specs is None:
        return None
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape.get("model", 1)
    local_heads = num_heads // tp
    if key_valid is None:
        key_valid = jnp.ones((b, k.shape[1]), bool)
    seed_arr = _seed_arr(seed)  # (1, 1) int32, replicated

    def body(q, k, v, valid, seed2d):
        # decorrelate the in-kernel dropout streams across shards
        local_seed = seed2d[0, 0]
        if dropout_rate > 0.0:
            di = jax.lax.axis_index("data")
            mi = jax.lax.axis_index("model")
            local_seed = local_seed + 7919 * di + 104729 * mi
        return mha_flash_flat(q, k, v, local_heads, valid, sm_scale,
                              dropout_rate,
                              local_seed if dropout_rate > 0.0 else None)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(specs["qkv"], specs["qkv"], specs["qkv"], specs["mask"],
                  P(None, None)),
        out_specs=specs["out"],
        check_vma=False)
    return fn(q, k, v, key_valid, seed_arr)
