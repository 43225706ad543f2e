# coding: utf-8
"""
Pipeline parallelism: GPipe-style microbatched execution of a homogeneous
transformer-layer stack across a `pipe` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.3); this is the
TPU-native construction: layer parameters are stacked along a leading
stage axis and sharded over `pipe`, `shard_map` gives each device its
stage's slice, and a `lax.fori_loop` rotates in-flight microbatch
activations stage-to-stage with `lax.ppermute` over ICI. Every stage runs
the same SPMD program (idle steps compute on garbage and are masked out),
so the schedule is the classic M + S - 1 step GPipe fill/drain. The whole
thing is differentiable — `ppermute` transposes to the reverse rotation,
so `jax.grad` yields the standard GPipe backward schedule for free.

Usage (see tests/test_pipeline_parallel.py):
    stacked = stack_layer_params([p per layer])       # (L, ...) pytree
    y = pipeline_apply(layer_fn, stacked, x, n_microbatches=4,
                       mesh=mesh, axis="pipe")
"""
import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stack_layer_params", "pipeline_apply"]


def stack_layer_params(per_layer_params: Sequence):
    """Stack per-layer param pytrees along a new leading (layer) axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_layer_params)


def pipeline_apply(
    layer_fn: Callable,
    stacked_params,
    x: jnp.ndarray,  # (B, ...) global batch
    n_microbatches: int,
    mesh: Mesh,
    axis: str = "pipe",
    *aux,
    rng=None,
    batch_axis=None,
):
    """Run ``layer_fn`` for each of the L stacked layers, pipelined over the
    ``axis`` dimension of ``mesh``.

    :param layer_fn: ``layer_fn(params_one_layer, x, *aux) -> x`` — one
        transformer layer; must preserve x's shape. When ``rng`` is given the
        signature is ``layer_fn(params_one_layer, x, *aux, rng) -> x``.
    :param stacked_params: pytree with leading layer axis L; L must divide
        evenly into mesh.shape[axis] stages (layers_per_stage = L // S).
    :param x: global input batch; dim 0 must divide n_microbatches.
    :param aux: extra arguments (e.g. the padding mask). Arrays whose dim 0
        equals the global batch are split into microbatches and indexed with
        the stage's in-flight microbatch; anything else is broadcast.
    :param rng: optional PRNG key threaded to every layer call, folded with
        (stage, microbatch, layer-in-stage) so dropout masks are independent
        across layers and microbatches.
    :param batch_axis: optional mesh axis name the batch dim is sharded over
        (composes pipeline with data parallelism: each ``batch_axis`` group
        pipelines its own batch shard over its ``axis`` peers).
    :return: output with x's shape, replicated over ``axis`` (and sharded
        over ``batch_axis`` like the input when given).
    """
    n_stages = mesh.shape[axis]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    assert x.shape[0] % n_microbatches == 0, (x.shape, n_microbatches)
    layers_per_stage = n_layers // n_stages
    m = n_microbatches

    # (L, ...) -> (S, L/S, ...): leading dim sharded one stage per device
    grouped = jax.tree.map(
        lambda a: a.reshape(n_stages, layers_per_stage, *a.shape[1:]),
        stacked_params)
    micro = x.reshape(m, x.shape[0] // m, *x.shape[1:])
    batch = x.shape[0]
    aux_is_batched = tuple(
        hasattr(a, "shape") and a.ndim >= 1 and a.shape[0] == batch
        for a in aux)
    aux = tuple(
        a.reshape(m, batch // m, *a.shape[1:]) if split else a
        for a, split in zip(aux, aux_is_batched))

    param_specs = jax.tree.map(lambda _: P(axis), grouped)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    # batch dim is axis 1 after the microbatch reshape
    batched_spec = P(None, batch_axis)
    aux_specs = tuple(batched_spec if split else P() for split in aux_is_batched)
    has_rng = rng is not None
    rng_args = (rng,) if has_rng else ()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(param_specs, batched_spec) + aux_specs
        + ((P(),) if has_rng else ()),
        out_specs=batched_spec,
    )
    def run(grouped_local, micro_all, *aux_all):
        if has_rng:
            *aux_all, rng_local = aux_all
        # grouped_local: (1, L/S, ...) — this device's stage parameters
        stage_params = jax.tree.map(lambda a: a[0], grouped_local)
        stage = jax.lax.axis_index(axis)

        def stage_apply(xin, mb_idx):
            aux_mb = tuple(
                a[mb_idx] if split else a
                for a, split in zip(aux_all, aux_is_batched))

            if has_rng:
                r = jax.random.fold_in(
                    jax.random.fold_in(rng_local, stage), mb_idx)

                def body(h, pl_li):
                    pl, li = pl_li
                    return layer_fn(pl, h, *aux_mb,
                                    jax.random.fold_in(r, li)), None

                out, _ = jax.lax.scan(
                    body, xin,
                    (stage_params, jnp.arange(layers_per_stage)))
                return out

            def body(h, pl):
                return layer_fn(pl, h, *aux_mb), None

            out, _ = jax.lax.scan(body, xin, stage_params)
            return out

        # mark the carries as device-varying over `axis` up front so the
        # fori_loop carry type is stable (see shard_map docs on VMA)
        state = jax.lax.pcast(jnp.zeros_like(micro_all[0]), axis, to="varying")
        outputs = jax.lax.pcast(jnp.zeros_like(micro_all), axis, to="varying")

        def step(t, carry):
            state, outputs = carry
            # this stage is working on microbatch t - stage (if in range);
            # stage 0 ingests it fresh, later stages consume the state handed
            # over by the previous stage
            mb_idx = jnp.clip(t - stage, 0, m - 1)
            feed = micro_all[jnp.clip(t, 0, m - 1)]
            xin = jnp.where(stage == 0, feed, state)
            out = stage_apply(xin, mb_idx)
            # the last stage finished microbatch t - (S - 1) at this step
            done_mb = t - (n_stages - 1)
            is_last = stage == n_stages - 1
            valid = jnp.logical_and(done_mb >= 0, done_mb < m)
            write = jnp.logical_and(is_last, valid)
            slot = jnp.clip(done_mb, 0, m - 1)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs,
                jnp.where(write, out, outputs[slot]),
                slot, axis=0)
            # rotate activations one stage forward
            state = jax.lax.ppermute(out, axis, perm)
            return state, outputs

        _, outputs = jax.lax.fori_loop(0, m + n_stages - 1, step,
                                       (state, outputs))
        # outputs are only valid on the last stage; broadcast them
        mask = (stage == n_stages - 1).astype(outputs.dtype)
        return jax.lax.psum(outputs * mask, axis)

    shardings = jax.tree.map(lambda _: NamedSharding(mesh, P(axis)), grouped)
    with mesh:
        out = run(jax.device_put(grouped, shardings), micro, *aux, *rng_args)
    return out.reshape(x.shape)
