# coding: utf-8
"""
Training manager (counterpart of joeynmt/training.py).

The hot path is a jit-compiled train step (forward + backward + optax update)
over statically-shaped, mesh-sharded batches; gradient accumulation keeps an
on-device gradient buffer across micro-batches (the reference relies on torch
autograd accumulation, joeynmt/training.py:436-459). LR scheduling, early
stopping, model selection, checkpoint best-K retention, validations.txt
reporting and example logging mirror the reference.
"""
import math
import time
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import optax

from joeys2t_tpu.checkpoints import CheckpointManager, load_checkpoint, partial_load
from joeys2t_tpu.config import (
    ConfigurationError,
    TestConfig,
    TrainConfig,
    log_config,
    parse_global_args,
    set_validation_args,
)
from joeys2t_tpu.data.batch import Batch
from joeys2t_tpu.helpers import write_list_to_file
from joeys2t_tpu.optim import (
    build_gradient_clipper,
    build_optimizer,
    build_scheduler,
    get_learning_rate,
    set_learning_rate,
)
from joeys2t_tpu.parallel import MeshContext, get_mesh
from joeys2t_tpu.prediction import predict, prepare, test
from joeys2t_tpu.plotting import store_attention_plots
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _prefetch_iter(it, depth: int = 2, name: str = "host-prefetch"):
    """Run an iterator one step ahead on a daemon thread (bounded queue).

    Worker exceptions are re-raised at the consuming side; closing the
    returned generator stops the worker. The wrapped iterator must be free
    of device collectives — those must stay on the caller's thread so their
    issue order is identical across hosts.
    """
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()
    end = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except _queue.Full:
                continue
        return False

    def worker():
        try:
            for item in it:
                if not _put(item):
                    return
            _put(end)
        except BaseException as e:  # pylint: disable=broad-except
            _put(e)  # re-raised on the consuming side

    t = threading.Thread(target=worker, daemon=True, name=name)
    t.start()
    try:
        while True:
            item = q.get()
            if item is end:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def _prefetch_prepared(stream, prepare_fn, depth: int = 2):
    """Run ``_prepare_batch`` one step ahead in a daemon thread.

    Host batch prep (np.load + CMVN/SpecAugment + collate + pad, measured
    ~400ms/batch cold on a 1-core host) and the device_put *issue* (~40ms;
    the transfer itself is async, blocking fraction 0.13 — see
    scripts/probe_sustained_train.py phase B2) then overlap device execution
    of the previous step instead of serializing with it. Single-process
    only — multi-host runs overlap the collective-free half of this work
    via the worker inside ``_multihost_sync_stream`` instead.
    """
    return _prefetch_iter(
        (prepare_fn(batch, sync_dims) for batch, sync_dims in stream),
        depth=depth, name="prepare-prefetch")


def _local_shape_stats(batch, batch_size: int, dp: int) -> np.ndarray:
    """This rank's per-batch shape vote: (alive, src_bucket, trg_bucket,
    target_batch) — allgathered so every rank pads to the global max."""
    from joeys2t_tpu.data.batch import round_up_to_bucket

    if batch is None:
        return np.zeros((4,), np.int64)
    tb = int(np.ceil(max(batch_size, batch.nseqs) / dp) * dp)
    trg_b = round_up_to_bucket(batch.trg.shape[1]) if batch.has_trg else 0
    return np.array(
        [1, round_up_to_bucket(batch.src.shape[1]), trg_b, tb], np.int64)


def _multihost_sync_stream(train_iter, batch_size: int, dp: int,
                           prefetch: bool = True):
    """Keep multi-host ranks in lock-step for one epoch of batches.

    Two hazards make naive per-process iteration diverge: (a) the samplers
    drop None-filtered instances AFTER the rank-strided split
    (data/samplers.py SentenceBatchSampler), so local batch counts can
    differ — the rank with more batches would block forever in the next
    global collective; (b) each rank's ``pad_to_shape`` buckets by its own
    local max length, but ``jax.make_array_from_process_local_data``
    needs identically-shaped local shards on every process. One tiny host
    allgather per batch settles both: the epoch ends at the first
    exhausted rank (matching drop_last spirit; the reference's torch-DDP
    loop hangs in this case, joeynmt/datasets.py:1164-1246 has the same
    post-split drop), and every rank pads to the globally-agreed shapes.

    The expensive, collective-free half of batch production (dataset IO,
    tokenization/feature loading, collate — everything inside iterating
    ``train_iter``) runs one step ahead on a worker thread; only the tiny
    per-batch allgather stays here on the main thread, so its issue order
    is identical on every host while host prep overlaps device compute.

    Yields ``(batch, (src_len, trg_len, target_b))``.
    """
    from jax.experimental import multihost_utils

    def produce():
        for batch in train_iter:
            yield batch, _local_shape_stats(batch, batch_size, dp)
        yield None, _local_shape_stats(None, batch_size, dp)

    pairs = _prefetch_iter(produce(), name="multihost-prefetch") \
        if prefetch else produce()
    try:
        for batch, local in pairs:
            glob = np.asarray(multihost_utils.process_allgather(local))
            if int(glob[:, 0].min()) == 0:
                if batch is not None:
                    logger.warning(
                        "Multi-host epoch sync: dropping local tail "
                        "batch(es) so all ranks finish the epoch together.")
                return
            yield batch, (int(glob[:, 1].max()), int(glob[:, 2].max()),
                          int(glob[:, 3].max()))
    finally:
        pairs.close()  # stops the prefetch worker (no-op for generators)


def frozen_prefixes(model_cfg: Dict) -> set:
    """Param-tree prefixes frozen via `freeze: True` in the model config."""
    frozen = set()
    if model_cfg.get("encoder", {}).get("freeze", False):
        frozen.add("encoder")
    if model_cfg.get("decoder", {}).get("freeze", False):
        frozen.add("decoder")
    if model_cfg.get("encoder", {}).get("embeddings", {}).get("freeze", False):
        frozen.add("src_embed")
    if model_cfg.get("decoder", {}).get("embeddings", {}).get("freeze", False):
        frozen.add("trg_embed")
    return frozen


def _freeze_mask(params: Dict, prefixes: set) -> Dict:
    """Bool pytree: True where the param belongs to a frozen prefix."""
    return {
        top: jax.tree.map(lambda _: top in prefixes, sub)
        for top, sub in params.items()
    }


def _batch_to_arrays(batch: Batch) -> Dict[str, Optional[np.ndarray]]:
    return {
        "src": batch.src,
        "trg_input": batch.trg_input,
        "trg": batch.trg,
        "src_length": batch.src_length,
        "src_mask": batch.src_mask,
        "trg_mask": batch.trg_mask,
        "trg_length": batch.trg_length,
        "src_prompt_mask": batch.src_prompt_mask,
        "trg_prompt_mask": batch.trg_prompt_mask,
    }


class TrainManager:
    """Manages training loop, validations, LR scheduling, early stopping
    (joeynmt/training.py:47-826)."""

    # pylint: disable=too-many-instance-attributes

    def __init__(
        self,
        model,
        spec,
        params,
        loss_fn,
        model_dir: Path,
        task: str,
        seed: int = 42,
        train_args: TrainConfig = None,
        dev_args: TestConfig = None,
        num_workers: int = 0,
        mesh: Optional[MeshContext] = None,
        model_cfg: Optional[Dict] = None,
    ) -> None:
        self.model = model
        self.spec = spec
        self.loss_fn = loss_fn
        self.task = task
        self.args = train_args
        self.dev_cfg = dev_args
        self.seed = seed
        self.model_dir = Path(model_dir)
        self.num_workers = num_workers
        if mesh is not None:
            self.mesh = mesh
        else:
            # 2-D (data, model) or (data, pipe) mesh straight from the YAML
            # `training: model_parallel` / `pipeline_parallel` knobs
            # (beyond-reference; the torch original is dp-only,
            # joeynmt/helpers_for_ddp.py)
            mp = getattr(self.args, "model_parallel", 1) or 1
            pp = getattr(self.args, "pipeline_parallel", 1) or 1
            if jax.device_count() % (mp * pp) != 0:
                raise ConfigurationError(
                    f"model_parallel={mp} * pipeline_parallel={pp} does not "
                    f"divide the {jax.device_count()} available devices.")
            self.mesh = get_mesh(model_parallel=mp, pipeline_parallel=pp)
        self._tp = self.mesh.mesh.shape.get("model", 1) > 1
        self._pp = self.mesh.mesh.shape.get("pipe", 1) > 1
        if self._pp:
            self._init_pipeline(model)
        # rank-0-only artifact writes (ckpts, validations.txt, hyps, plots,
        # tensorboard) — the reference's `rank == 0` gating
        # (joeynmt/training.py:149-218, :687-702)
        self.is_main = jax.process_index() == 0

        # tensorboard (optional dependency)
        try:
            from tensorboardX import SummaryWriter

            self.tb_writer = SummaryWriter(
                log_dir=(self.model_dir / "tensorboard").as_posix()) \
                if self.is_main else None
        except Exception:  # pragma: no cover
            self.tb_writer = None

        # optimization: clip -> optimizer chain; lr injected as state
        clipper = build_gradient_clipper(self.args.__dict__)
        base_tx = build_optimizer(self.args.__dict__)
        self.tx = optax.chain(clipper, base_tx) if clipper is not None else base_tx
        self._clipped = clipper is not None

        self.params = self._place_params(params)
        # `freeze: True` sub-modules get zero updates (the reference's
        # freeze_params / requires_grad=False, joeynmt/helpers.py)
        frozen = frozen_prefixes(model_cfg or {})
        if frozen:
            mask = _freeze_mask(self.params, frozen)
            self.tx = optax.chain(self.tx, optax.masked(optax.set_to_zero(), mask))
            logger.info("Frozen parameter groups: %s", sorted(frozen))
        self.opt_state = self.tx.init(self.params)

        self.scheduler, self.scheduler_step_at = build_scheduler(
            cfg=self.args.__dict__,
            scheduler_mode="min" if self.args.minimize_metric else "max",
            hidden_size=getattr(self.model.encoder, "hidden_size", 0))

        self.ckpt_mgr = CheckpointManager(
            self.model_dir, keep_best_ckpts=self.args.keep_best_ckpts,
            minimize_metric=self.args.minimize_metric)

        self.train_iter, self.train_iter_state = None, None
        self.batch_sampler = None
        self.stats = TrainStatistics(minimize_metric=self.args.minimize_metric)

        # eval/search shard their inputs over this mesh too
        from joeys2t_tpu.parallel.mesh import set_default_mesh

        set_default_mesh(self.mesh)

        self._dropout_rng = jax.random.PRNGKey(seed + 7919)

        # host->device feature dtype (training: feature_dtype). The sustained
        # train loop is transfer-bound on remote TPU topologies: the (B, T, 80)
        # f32 features dominate upload bytes, and the encoder casts inputs to
        # its compute dtype on device anyway — so when that dtype is bfloat16,
        # uploading bf16 halves the bytes with bit-identical downstream math
        # (both paths are one f32->bf16 round-to-nearest-even).
        fd = getattr(self.args, "feature_dtype", "auto")
        enc_dtype = getattr(self.model.encoder, "dtype", jnp.float32)
        self._feature_dtype = (
            ml_dtypes.bfloat16 if fd == "bfloat16"
            or (fd == "auto" and enc_dtype == jnp.bfloat16) else np.float32)

        # jitted steps
        self._jit_train_step = self._make_train_step()
        self._jit_accum_step = self._make_accum_step()
        self._jit_apply_accum = self._make_apply_accum()
        self._zero_grads = None

        if self.args.load_model is not None:
            self.init_from_checkpoint(
                self.args.load_model,
                reset_best_ckpt=self.args.reset_best_ckpt,
                reset_scheduler=self.args.reset_scheduler,
                reset_optimizer=self.args.reset_optimizer,
                reset_iter_state=self.args.reset_iter_state)
        for layer_name, load_path in [("encoder", self.args.load_encoder),
                                      ("decoder", self.args.load_decoder)]:
            if load_path is not None:
                self.init_layers(path=load_path, layer=layer_name)

    # --------------------------------------------------------- param placement
    def _place_params(self, params):
        """Replicated placement (dp), or Megatron-style sharding over the
        `model` axis when model_parallel > 1 (parallel/tp.py). GSPMD derives
        the matching gradient/optimizer shardings and inserts the per-layer
        all-reduces; the train/accum/apply steps need no changes."""
        if not self._tp:
            return self.mesh.replicate_tree(params)
        from joeys2t_tpu.parallel.tp import shard_params_tp

        return shard_params_tp(params, self.mesh)

    def _place_opt_state(self, opt_state):
        """Restored optimizer state is host numpy; under tp, place each leaf
        with the sharding GSPMD gives the freshly-initialized state (adam
        mu/nu inherit their param's sharding), so resume keeps the tp memory
        savings. Structure-wise the restored and fresh states match (same
        optax chain); the template buffers are freed right after."""
        if not self._tp:
            return opt_state
        template = jax.jit(self.tx.init)(self.params)
        placed = jax.tree.map(
            lambda t, s: jax.device_put(np.asarray(s), t.sharding)
            if isinstance(t, jax.Array) else s, template, opt_state)
        return placed

    # ----------------------------------------------------- pipeline parallel
    def _init_pipeline(self, model) -> None:
        """Validate + prepare the GPipe path (`training: pipeline_parallel`).

        BOTH homogeneous layer stacks are staged over the `pipe` mesh axis
        (parallel/pp.pipeline_apply): the encoder stack always (its depth,
        and for S2T 4x the sequence length, is where the FLOPs live), the
        decoder stack whenever its num_layers divides the stage count —
        otherwise the decoder runs replicated (logged below). Prologues
        (subsampler/PE/embeddings/dropout), final norms, output/CTC heads
        and the loss stay data-parallel. MoE encoders are excluded: expert
        routing sows aux losses that do not thread through shard_map
        microbatch rotation (documented scope, not a TODO)."""
        from joeys2t_tpu.models.decoders import TransformerDecoder
        from joeys2t_tpu.models.encoders import ConformerEncoder, TransformerEncoder
        from joeys2t_tpu.models.modules import (
            ConformerEncoderLayer,
            TransformerDecoderLayer,
            TransformerEncoderLayer,
        )

        enc, dec = model.encoder, model.decoder
        n_stages = self.mesh.mesh.shape["pipe"]
        if not isinstance(enc, (TransformerEncoder, ConformerEncoder)):
            raise ConfigurationError(
                "pipeline_parallel supports transformer and conformer "
                f"encoders (got {type(enc).__name__}).")
        if getattr(enc, "num_experts", 0):
            raise ConfigurationError(
                "pipeline_parallel does not compose with MoE encoders.")
        if enc.num_layers % n_stages != 0:
            raise ConfigurationError(
                f"encoder num_layers={enc.num_layers} must be divisible by "
                f"pipeline_parallel={n_stages}.")
        m = getattr(self.args, "pipeline_microbatches", 0) or 0
        self._pp_microbatches = m if m > 0 else 2 * n_stages
        # standalone layer modules, applied per-stage with the per-layer
        # param subtrees (params.{encoder,decoder}.layer_i) stacked over `pipe`
        if isinstance(enc, ConformerEncoder):
            self._pp_layer = ConformerEncoderLayer(
                size=enc.hidden_size, ff_size=enc.ff_size,
                num_heads=enc.num_heads, dropout=enc.dropout, alpha=enc.alpha,
                layer_norm_position=enc.layer_norm_position,
                depthwise_conv_kernel_size=enc.depthwise_conv_kernel_size,
                dtype=enc.dtype, attn_impl=enc.attn_impl,
                conv_norm_type=enc.conv_norm_type, macaron=enc.macaron,
                layerscale_init=enc.layerscale_init)
        else:
            self._pp_layer = TransformerEncoderLayer(
                size=enc.hidden_size, ff_size=enc.ff_size,
                num_heads=enc.num_heads, dropout=enc.dropout, alpha=enc.alpha,
                layer_norm_position=enc.layer_norm_position,
                activation=enc.activation, dtype=enc.dtype,
                attn_impl=enc.attn_impl)
        self._pp_dec_layer = None
        if (isinstance(dec, TransformerDecoder)
                and dec.num_layers % n_stages == 0):
            self._pp_dec_layer = TransformerDecoderLayer(
                size=dec.hidden_size, ff_size=dec.ff_size,
                num_heads=dec.num_heads, dropout=dec.dropout, alpha=dec.alpha,
                layer_norm_position=dec.layer_norm_position,
                activation=dec.activation, dtype=dec.dtype,
                attn_impl=dec.attn_impl)
        else:
            logger.info(
                "pipeline_parallel: decoder runs replicated (needs a "
                "transformer decoder with num_layers divisible by %d).",
                n_stages)

    def _loss_and_metrics_pp(self, params, batch, dropout_rng, normalizer):
        """GPipe variant of _loss_and_metrics: identical math, with the
        encoder layer stack (and, when staged, the decoder layer stack) run
        by parallel.pp.pipeline_apply over `pipe`."""
        from joeys2t_tpu.parallel.pp import pipeline_apply, stack_layer_params

        model = self.model
        r_pre, r_layers, r_dec = jax.random.split(dropout_rng, 3)
        x, mask = model.apply(
            {"params": params}, batch["src"], batch["src_length"],
            batch["src_mask"], src_prompt_mask=batch["src_prompt_mask"],
            deterministic=False, rngs={"dropout": r_pre},
            method="encode_pre_layers")
        n_layers = model.encoder.num_layers
        stacked = stack_layer_params(
            [params["encoder"][f"layer_{i}"] for i in range(n_layers)])
        layer = self._pp_layer

        def layer_fn(p, h, m, rng):
            return layer.apply({"params": p}, h, m, False,
                               rngs={"dropout": rng})

        x = pipeline_apply(layer_fn, stacked, x, self._pp_microbatches,
                           self.mesh.mesh, "pipe", mask, rng=r_layers,
                           batch_axis="data")
        enc_out = model.apply({"params": params}, x,
                              method="encode_post_layers")

        if self._pp_dec_layer is None:  # decoder replicated
            logits, _, _, _, ctc_logits = model.apply(
                {"params": params}, batch["trg_input"], enc_out, mask,
                batch["trg_mask"], trg_prompt_mask=batch["trg_prompt_mask"],
                deterministic=False, rngs={"dropout": r_dec}, method="decode")
        else:  # decoder staged over `pipe` too
            r_dec_pre, r_dec_layers = jax.random.split(r_dec)
            y, full_trg_mask = model.apply(
                {"params": params}, batch["trg_input"], batch["trg_mask"],
                trg_prompt_mask=batch["trg_prompt_mask"], deterministic=False,
                rngs={"dropout": r_dec_pre}, method="decode_pre_layers")
            dec_stacked = stack_layer_params(
                [params["decoder"][f"layer_{i}"]
                 for i in range(model.decoder.num_layers)])
            dec_layer = self._pp_dec_layer

            def dec_layer_fn(p, h, memory, s_mask, t_mask, rng):
                out, _ = dec_layer.apply({"params": p}, h, memory, s_mask,
                                         t_mask, False, False,
                                         rngs={"dropout": rng})
                return out

            y = pipeline_apply(dec_layer_fn, dec_stacked, y,
                               self._pp_microbatches, self.mesh.mesh, "pipe",
                               enc_out, mask, full_trg_mask,
                               rng=r_dec_layers, batch_axis="data")
            logits, ctc_logits = model.apply(
                {"params": params}, y, enc_out, method="decode_post_layers")
        return self._finish_loss(logits, ctc_logits, mask, batch, normalizer,
                                 aux=jnp.zeros(()))

    # -------------------------------------------------------------- jit steps
    def _loss_and_metrics(self, params, batch, dropout_rng, normalizer):
        model = self.model
        (logits, ctc_logits, out_mask), mutated = model.apply(
            {"params": params}, batch["src"], batch["trg_input"],
            batch["src_length"], batch["src_mask"], batch["trg_mask"],
            src_prompt_mask=batch["src_prompt_mask"],
            trg_prompt_mask=batch["trg_prompt_mask"],
            deterministic=False, rngs={"dropout": dropout_rng},
            mutable=["aux_loss"])
        # MoE load-balance terms sown by MoEFeedForward (Switch aux loss,
        # coefficient 0.01 per arXiv:2101.03961 §2.2); empty for dense models
        aux = sum(jnp.sum(jnp.asarray(v))
                  for v in jax.tree.leaves(mutated.get("aux_loss", {})))
        return self._finish_loss(logits, ctc_logits, out_mask, batch,
                                 normalizer, aux)

    def _finish_loss(self, logits, ctc_logits, out_mask, batch, normalizer,
                     aux):
        loss_fn = self.loss_fn
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        kwargs = dict(trg=batch["trg"])
        if loss_fn.require_ctc_layer and ctc_logits is not None:
            # raw logits: the CTC op fuses gather+logsumexp itself (MXU
            # one-hot matmul; no (B, T, V) f32 log-softmax materialization)
            kwargs.update(trg_length=batch["trg_length"], src_mask=out_mask,
                          ctc_logits=ctc_logits)
        losses = loss_fn(log_probs, **kwargs)
        total = losses[0]
        nll = losses[1] if len(losses) > 1 else total
        ctc = losses[2] if len(losses) > 2 else jnp.zeros(())
        trg_mask_2d = batch["trg_mask"][:, 0, :]
        n_correct = jnp.sum(
            jnp.where(trg_mask_2d, jnp.argmax(log_probs, -1) == batch["trg"], False))
        # normalize (joeynmt/batch.py:135-175); accumulation divide folded in
        norm = total / normalizer / self.args.batch_multiplier
        # no-op (aux==0) unless MoE layers are present; divided like the CE
        # term so gradient accumulation keeps the effective coefficient 0.01
        norm = norm + 0.01 * aux / self.args.batch_multiplier
        metrics = (norm, nll / normalizer / self.args.batch_multiplier,
                   ctc / normalizer / self.args.batch_multiplier, n_correct)
        return norm, metrics

    @property
    def _loss_impl(self):
        """The training loss path: GPipe-pipelined when `pipe` is in the
        mesh, the plain dense/MoE forward otherwise."""
        return self._loss_and_metrics_pp if self._pp else self._loss_and_metrics

    def _make_train_step(self):
        # params/opt_state are replaced by the returned trees every step, so
        # their input buffers are donated — XLA updates ~3x param-size state
        # in place instead of allocating fresh output buffers each step
        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, dropout_rng, batch, normalizer):
            (_, metrics), grads = jax.value_and_grad(
                self._loss_impl, has_aux=True)(params, batch, dropout_rng,
                                               normalizer)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return train_step

    def _make_accum_step(self):
        # the running grad sum is consumed and re-returned; params stay live
        # across the accumulation window and must not be donated
        @partial(jax.jit, donate_argnums=(1,))
        def accum_step(params, accum, dropout_rng, batch, normalizer):
            (_, metrics), grads = jax.value_and_grad(
                self._loss_impl, has_aux=True)(params, batch, dropout_rng,
                                               normalizer)
            accum = jax.tree.map(jnp.add, accum, grads)
            return accum, metrics

        return accum_step

    def _make_apply_accum(self):
        # all three inputs die here: params/opt_state are replaced by the
        # returns and the grad sum is reset to None by the caller
        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def apply_accum(params, opt_state, accum):
            updates, opt_state = self.tx.update(accum, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state

        return apply_accum

    # ----------------------------------------------------------- ckpt wiring
    def _state_for_ckpt(self) -> Dict:
        return {
            "model_state": self.params,
            "optimizer_state": jax.tree.map(np.asarray, self.opt_state),
            "scaler_state": None,  # kept for checkpoint-layout parity
            "scheduler_state": (self.scheduler.state_dict()
                                if self.scheduler is not None else None),
            "train_iter_state": (self.batch_sampler.get_state()
                                 if self.batch_sampler is not None else None),
            "stats_state": self.stats.state_dict(),
        }

    def _save_checkpoint(self, new_best: bool, score: float) -> None:
        if not self.is_main:
            return
        self.ckpt_mgr.save(self.stats.steps, self._state_for_ckpt(), new_best, score)

    def init_from_checkpoint(self, path, reset_best_ckpt=False, reset_scheduler=False,
                             reset_optimizer=False, reset_iter_state=False) -> None:
        """joeynmt/training.py:220-292."""
        logger.info("Loading model from %s", path)
        ckpt = load_checkpoint(path)
        self.params = self._place_params(ckpt["model_state"])

        if not reset_optimizer and ckpt.get("optimizer_state") is not None:
            self.opt_state = self._place_opt_state(ckpt["optimizer_state"])
        else:
            self.opt_state = self.tx.init(self.params)
            if reset_optimizer:
                logger.info("Reset optimizer.")

        if not reset_scheduler:
            if ckpt.get("scheduler_state") is not None and self.scheduler is not None:
                self.scheduler.load_state_dict(ckpt["scheduler_state"])
        else:
            logger.info("Reset scheduler.")

        if not reset_best_ckpt:
            if "stats_state" in ckpt:
                self.stats.load_state_dict(ckpt["stats_state"])
        else:
            logger.info("Reset tracking of the best checkpoint.")

        if not reset_iter_state:
            self.train_iter_state = ckpt.get("train_iter_state")
        else:
            logger.info("Reset data iterator (random seed: {%d}).", self.seed)

    def init_layers(self, path: Path, layer: str) -> None:
        """Partial encoder/decoder init for ST transfer
        (joeynmt/training.py:294-309)."""
        assert path is not None
        logger.info("Loading %s layers from %s", layer, path)
        ckpt = load_checkpoint(path)
        self.params = self._place_params(
            partial_load(dict(self.params), ckpt["model_state"], layer))

    # -------------------------------------------------------------- main loop
    def train_and_validate(self, train_data, valid_data) -> None:
        """joeynmt/training.py:311-539."""
        # pylint: disable=too-many-branches,too-many-statements
        self.train_iter, self.batch_sampler = train_data.make_iter(
            batch_size=self.args.batch_size,
            batch_type=self.args.batch_type,
            seed=self.seed,
            shuffle=self.args.shuffle,
            num_workers=self.num_workers,
            eos_index=self.spec.eos_index,
            pad_index=self.spec.pad_index,
            return_sampler=True,
        )
        if self.train_iter_state is not None:
            self.batch_sampler.set_state(self.train_iter_state)

        dp_size = self.mesh.mesh.shape["data"]
        logger.info(
            "Train config:\n\tdevices: %d (data=%d, model=%d)\n"
            "\tgradient accumulation: %d\n"
            "\tbatch size per data shard: %d\n\teffective batch size: %d",
            self.mesh.n_devices, dp_size, self.mesh.mesh.shape.get("model", 1),
            self.args.batch_multiplier,
            self.args.batch_size // max(dp_size, 1),
            self.args.batch_size * self.args.batch_multiplier)

        # initial lr
        if self.scheduler is not None and self.scheduler_step_at == "step":
            set_learning_rate(self._inner_opt_state(), self.scheduler.step(0))

        # optional profiling: `training: profile_dir:` in the YAML (or env
        # var JOEYS2T_PROFILE_DIR, which overrides) captures an
        # xplane/perfetto trace of steps 10..20 (SURVEY.md §5.1 upgrade —
        # the reference only logs wall-clock tokens/sec)
        import os

        profile_dir = os.environ.get("JOEYS2T_PROFILE_DIR") or (
            str(self.args.profile_dir)
            if getattr(self.args, "profile_dir", None) else None)
        profile_window = None
        if profile_dir:
            # JOEYS2T_PROFILE_WINDOW="start,stop" narrows the traced step
            # range (host-side tracing overhead is real on slow hosts)
            raw = os.environ.get("JOEYS2T_PROFILE_WINDOW", "10,20")
            lo, hi = (int(v) for v in raw.split(","))
            profile_window = (lo, hi)

        epoch_no = self.stats.epochs
        prepared_stream = None
        try:
            for epoch_no in range(self.stats.epochs, self.args.epochs + 1, 1):
                logger.info("EPOCH %d", epoch_no)
                self.stats.epochs = epoch_no

                if self.scheduler_step_at == "epoch":
                    rate = self.scheduler.step(epoch_no)
                    set_learning_rate(self._inner_opt_state(), rate)

                train_data.seed = self.seed + epoch_no
                valid_data.seed = self.seed + epoch_no
                self.batch_sampler.set_seed(self.seed + epoch_no)

                start_tokens = self.stats.total_tokens
                start_correct = self.stats.total_correct
                epoch_nseqs, epoch_ntokens, epoch_loss = 0, 0, 0.0
                total_valid_duration = 0.0
                start = time.time()

                accum = None
                micro = 0
                pending = []  # (step_no, [device metrics]) awaiting sync
                micro_metrics = []
                if jax.process_count() > 1:
                    stream = _multihost_sync_stream(
                        self.train_iter, self.args.batch_size,
                        self.mesh.mesh.shape["data"])
                    prepared_stream = (self._prepare_batch(b, sd)
                                       for b, sd in stream)
                else:
                    stream = ((b, None) for b in self.train_iter)
                    prepared_stream = _prefetch_prepared(
                        stream, self._prepare_batch)
                for nseqs_real, ntokens_real, arrays, normalizer \
                        in prepared_stream:
                    self._dropout_rng, step_rng = jax.random.split(self._dropout_rng)

                    if self.args.batch_multiplier == 1:
                        self.params, self.opt_state, metrics = self._jit_train_step(
                            self.params, self.opt_state, step_rng, arrays,
                            normalizer)
                        stepped = True
                    else:
                        if accum is None:
                            accum = jax.tree.map(jnp.zeros_like, self.params)
                        accum, metrics = self._jit_accum_step(
                            self.params, accum, step_rng, arrays, normalizer)
                        micro += 1
                        stepped = micro >= self.args.batch_multiplier
                        if stepped:
                            self.params, self.opt_state = self._jit_apply_accum(
                                self.params, self.opt_state, accum)
                            accum = None
                            micro = 0

                    # Defer metric materialization: float(loss) blocks the
                    # host until the step finishes, serializing batch prep
                    # with device compute (and paying a full round-trip per
                    # step on remote backends). Metrics stay device scalars
                    # until the next logging/validation boundary, so the
                    # host runs ahead, overlapping collate + pad +
                    # device_put of step N+1 with step N's execution.
                    micro_metrics.append(metrics)
                    epoch_nseqs += nseqs_real
                    epoch_ntokens += ntokens_real
                    self.stats.total_tokens += ntokens_real

                    if stepped:
                        self.stats.steps += 1
                        pending.append((self.stats.steps, micro_metrics))
                        micro_metrics = []
                        if profile_window is not None:
                            if self.stats.steps == profile_window[0]:
                                jax.profiler.start_trace(profile_dir)
                            elif self.stats.steps == profile_window[1]:
                                jax.profiler.stop_trace()
                                logger.info("Profiler trace written to %s",
                                            profile_dir)
                                profile_window = None
                        if self.scheduler_step_at == "step":
                            rate = self.scheduler.step(self.stats.steps)
                            set_learning_rate(self._inner_opt_state(), rate)

                        if self.stats.steps >= self.args.max_updates:
                            self.stats.is_max_update = True

                        if self.stats.steps % self.args.logging_freq == 0:
                            losses_sum, last_loss = \
                                self._sync_pending_metrics(pending)
                            epoch_loss += losses_sum
                            elapsed = time.time() - start - total_valid_duration
                            self._log_scores(epoch_no, elapsed, start_tokens,
                                             start_correct, last_loss)
                            start = time.time()
                            start_tokens = self.stats.total_tokens
                            start_correct = self.stats.total_correct
                            total_valid_duration = 0

                        if self.stats.steps % self.args.validation_freq == 0:
                            epoch_loss += self._sync_pending_metrics(pending)[0]
                            valid_start_time = time.time()
                            valid_data.seed = self.seed + self.stats.steps
                            self._validate(valid_data)
                            total_valid_duration += time.time() - valid_start_time

                    if self.stats.is_min_lr or self.stats.is_max_update:
                        break

                # stop the prefetch worker promptly on break (it would
                # otherwise keep polling its bounded queue until GC)
                prepared_stream.close()

                if micro_metrics:
                    # incomplete accumulation group at epoch end: no optimizer
                    # step ran, but its micro-batch losses still count into
                    # the epoch totals (matching the eager accounting)
                    pending.append((self.stats.steps, micro_metrics))
                    micro_metrics = []
                epoch_loss += self._sync_pending_metrics(pending)[0]
                if self.stats.is_min_lr or self.stats.is_max_update:
                    log_str = (f"minimum lr {self.args.learning_rate_min}"
                               if self.stats.is_min_lr else
                               f"maximum num. of updates {self.args.max_updates}")
                    logger.info("Training ended since %s was reached.", log_str)
                    break

                logger.info(
                    "Epoch %3d, total training loss: %.2f, num. of seqs: %d, "
                    "num. of tokens: %d, %.4f[sec]", epoch_no, epoch_loss,
                    epoch_nseqs, epoch_ntokens,
                    time.time() - start - total_valid_duration)
            else:
                logger.info("Training ended after %3d epochs.", epoch_no)

        except KeyboardInterrupt:
            logger.info("Interrupt at epoch %d, step %d.", epoch_no, self.stats.steps)

        else:
            logger.info("Best validation result (greedy) at step %8d: %6.2f %s.",
                        self.stats.best_ckpt_iter, self.stats.best_ckpt_score,
                        self.args.early_stopping_metric)
        finally:
            if prepared_stream is not None:  # interrupt mid-epoch: stop the
                prepared_stream.close()      # prefetch worker before saving
            try:
                self._save_checkpoint(False, float("nan"))
            except RuntimeError as e:
                # an interrupt that lands inside the jitted step can leave
                # self.params pointing at donated (deleted) buffers; prefer
                # losing the final snapshot over crashing the shutdown path.
                # Any other save failure should still surface loudly.
                if "deleted" not in str(e).lower():
                    raise
                logger.warning("Final checkpoint skipped (%s)", e)
            if self.tb_writer is not None:
                self.tb_writer.close()

    def _prepare_batch(self, batch: Batch, sync_dims=None):
        """Pad to static shapes, device_put with data sharding, compute the
        loss normalizer from the real counts. ``sync_dims`` carries the
        globally-agreed (src_len, trg_len, target_b) in multi-host runs."""
        nseqs_real, ntokens_real = batch.nseqs, batch.ntokens
        dp = self.mesh.mesh.shape["data"]
        # GPipe splits the batch into microbatches before the `data` shard,
        # so each batch must divide microbatches * dp — pad up to that here
        # rather than dying on a trace-time assert inside the jitted step
        # (token batching and epoch-tail batches have variable sizes)
        quantum = dp * (self._pp_microbatches if self._pp else 1)
        target_b = max(self.args.batch_size, nseqs_real)
        target_b = int(np.ceil(target_b / quantum) * quantum)
        if sync_dims is not None:
            src_len, trg_len, tb = sync_dims
            tb = int(np.ceil(tb / quantum) * quantum)
            padded = batch.pad_to_shape(batch_size=max(target_b, tb),
                                        src_len=src_len,
                                        trg_len=trg_len or None)
        else:
            padded = batch.pad_to_shape(batch_size=target_b)
        arrays = _batch_to_arrays(padded)
        src = arrays["src"]
        if (src is not None and src.dtype == np.float32
                and self._feature_dtype is not np.float32):
            arrays["src"] = src.astype(self._feature_dtype)
        from joeys2t_tpu.parallel import shard_batch_arrays

        arrays = shard_batch_arrays(arrays, self.mesh)
        if self.args.normalization == "batch":
            normalizer = float(nseqs_real)
        elif self.args.normalization == "tokens":
            normalizer = float(ntokens_real)
        else:
            normalizer = 1.0
        return nseqs_real, ntokens_real, arrays, jnp.float32(normalizer)

    def _inner_opt_state(self):
        """The InjectHyperparamsState (possibly nested under the clip chain)."""
        state = self.opt_state
        if hasattr(state, "hyperparams"):
            return state
        for s in state:  # chain states are a tuple
            if hasattr(s, "hyperparams"):
                return s
        raise RuntimeError("Could not locate InjectHyperparamsState")

    @property
    def current_lr(self) -> float:
        return get_learning_rate(self._inner_opt_state())

    # ------------------------------------------------------------- validation
    def _validate(self, valid_data):
        """joeynmt/training.py:598-686."""
        prediction = predict(
            params=self.params, model=self.model, spec=self.spec, data=valid_data,
            loss_fn=self.loss_fn, compute_loss=True,
            normalization=self.args.normalization, args=self.dev_cfg)

        (valid_scores, valid_references, valid_hypotheses, valid_hypotheses_raw,
         _, valid_attention_scores) = prediction

        if self.tb_writer is not None:
            for eval_metric, score in valid_scores.items():
                if not math.isnan(score):
                    self.tb_writer.add_scalar(f"valid/{eval_metric}", score,
                                              self.stats.steps)

        ckpt_score = valid_scores[self.args.early_stopping_metric]

        if self.scheduler_step_at == "validation":
            rate = self.scheduler.step_metric(ckpt_score)
            set_learning_rate(self._inner_opt_state(), rate)

        new_best = self.stats.is_best(ckpt_score)
        if new_best:
            self.stats.best_ckpt_score = ckpt_score
            self.stats.best_ckpt_iter = self.stats.steps
            logger.info("Hooray! New best validation result [%s]!",
                        self.args.early_stopping_metric)

        is_better = (self.stats.is_better(ckpt_score, self.ckpt_mgr.ckpt_queue)
                     if len(self.ckpt_mgr.ckpt_queue) > 0 else True)
        if self.args.keep_best_ckpts < 0 or is_better:
            self._save_checkpoint(new_best, ckpt_score)

        self._add_report(valid_scores=valid_scores, new_best=new_best)
        self._log_examples(references=valid_references, hypotheses=valid_hypotheses,
                           hypotheses_raw=valid_hypotheses_raw, data=valid_data)
        if self.is_main:
            write_list_to_file(self.model_dir / f"{self.stats.steps}.hyps",
                               valid_hypotheses)

        if valid_attention_scores and self.is_main:
            store_attention_plots(
                attentions=valid_attention_scores, targets=valid_hypotheses_raw,
                sources=valid_data.get_list(lang=valid_data.src_lang, tokenized=True,
                                            subsampled=True),
                indices=self.args.print_valid_sents,
                output_prefix=(self.model_dir / f"att.{self.stats.steps}").as_posix(),
                tb_writer=self.tb_writer, steps=self.stats.steps)

    def _add_report(self, valid_scores: dict, new_best: bool = False) -> None:
        """validations.txt report (joeynmt/training.py:687-702)."""
        if not self.is_main:
            return
        current_lr = self.current_lr
        valid_file = self.model_dir / "validations.txt"
        with valid_file.open("a", encoding="utf-8") as opened_file:
            score_str = "\t".join([f"Steps: {self.stats.steps}"] + [
                f"{eval_metric}: {score:.5f}"
                for eval_metric, score in valid_scores.items()
                if not math.isnan(score)
            ] + [f"LR: {current_lr:.8f}", "*" if new_best else ""])
            opened_file.write(f"{score_str}\n")

    def _log_examples(self, hypotheses, references, hypotheses_raw, data) -> None:
        """joeynmt/training.py:704-738."""
        for p in self.args.print_valid_sents:
            if p >= len(hypotheses):
                continue
            logger.info("Example #%d", p)
            detokenized_src = (
                data.tokenizer[data.src_lang].post_process(data.src[p])
                if self.task == "MT" else data.src[p])
            logger.info("\tSource:     %s", detokenized_src)
            logger.info("\tReference:  %s", references[p])
            logger.info("\tHypothesis: %s", hypotheses[p])

    def _sync_pending_metrics(self, pending) -> Tuple[float, float]:
        """Materialize deferred per-step device metrics in one host sync.

        ``pending`` holds (step_no, [metric tuples]) groups — one group per
        optimizer step, one tuple per micro-batch. Updates
        ``stats.total_correct`` and performs the host-side non-finite-loss
        check (the reference asserts per batch, joeynmt/loss.py:166-167; here
        the check lands at the next logging/validation boundary so the step
        loop never blocks on the device). Returns (sum of per-step losses,
        loss of the most recent step) and clears ``pending``."""
        losses_sum, last_loss = 0.0, 0.0
        for step_no, group in pending:
            step_loss = 0.0
            for m in group:
                v = float(m[0])
                if not np.isfinite(v):
                    logger.warning("Non-finite batch loss %s at step %d",
                                   v, step_no)
                step_loss += v
                self.stats.total_correct += int(m[3])
            losses_sum += step_loss
            last_loss = step_loss
        pending.clear()
        return losses_sum, last_loss

    def _log_scores(self, epoch_no, elapsed_time, start_tokens, start_correct,
                    total_batch_loss) -> None:
        """joeynmt/training.py:740-766."""
        elapsed_tok = self.stats.total_tokens - start_tokens
        elapsed_correct = self.stats.total_correct - start_correct
        steps = self.stats.steps
        if self.tb_writer is not None:
            self.tb_writer.add_scalar("train/batch_loss", total_batch_loss, steps)
            if elapsed_tok > 0:
                self.tb_writer.add_scalar("train/batch_acc",
                                          elapsed_correct / elapsed_tok, steps)
        current_lr = self.current_lr
        if current_lr < self.args.learning_rate_min:
            self.stats.is_min_lr = True
        if self.tb_writer is not None:
            self.tb_writer.add_scalar("train/learning_rate", current_lr, steps)
        logger.info(
            "Epoch %3d, Step: %8d, Batch Loss: %12.6f, Batch Acc: %.6f, "
            "Tokens per Sec: %8.0f, Lr: %.6f", epoch_no, steps, total_batch_loss,
            elapsed_correct / max(elapsed_tok, 1), elapsed_tok / max(elapsed_time, 1e-9),
            current_lr)


class TrainStatistics:
    """joeynmt/training.py:768-826."""

    def __init__(self, minimize_metric: bool = True) -> None:
        self.epochs = 1
        self.steps = 0
        self.is_min_lr = False
        self.is_max_update = False
        self.total_tokens = 0
        self.best_ckpt_iter = 0
        self.minimize_metric = minimize_metric
        self.best_ckpt_score = float("inf") if minimize_metric else float("-inf")
        self.total_correct = 0

    def is_best(self, score) -> bool:
        if self.minimize_metric:
            return score < self.best_ckpt_score
        return score > self.best_ckpt_score

    def is_better(self, score: float, heap_queue: list) -> bool:
        # heap entries are (key, path) with key = -score for minimized
        # metrics (see CheckpointManager.save), so heap_queue[0] is always
        # the worst retained checkpoint and "better" is a key comparison
        assert len(heap_queue) > 0
        key = -score if self.minimize_metric else score
        return key > heap_queue[0][0]

    def state_dict(self) -> Dict:
        return {
            "epochs": self.epochs,
            "steps": self.steps,
            "total_tokens": self.total_tokens,
            "total_correct": self.total_correct,
            "best_ckpt_score": self.best_ckpt_score,
            "best_ckpt_iter": self.best_ckpt_iter,
        }

    def load_state_dict(self, state_dict: Dict) -> None:
        self.epochs = state_dict["epochs"]
        self.steps = state_dict["steps"]
        self.total_tokens = state_dict["total_tokens"]
        self.total_correct = state_dict["total_correct"]
        self.best_ckpt_score = state_dict["best_ckpt_score"]
        self.best_ckpt_iter = state_dict["best_ckpt_iter"]


def train(cfg: Dict, skip_test: bool = False) -> None:
    """Main training entry (joeynmt/training.py:829-895). Multi-host setups
    initialize jax.distributed before calling this."""
    log_config(cfg)
    args = parse_global_args(cfg, rank=0, mode="train")

    model, spec, params, loss_fn, train_data, dev_data, test_data = prepare(
        args, rank=0, mode="train")
    dev_args = set_validation_args(args.test)

    trainer = TrainManager(
        model=model, spec=spec, params=params, loss_fn=loss_fn,
        model_dir=args.model_dir, task=args.task, seed=args.seed,
        train_args=args.train, dev_args=dev_args, num_workers=args.num_workers,
        model_cfg=args.model)

    trainer.train_and_validate(train_data=train_data, valid_data=dev_data)

    if jax.process_count() > 1:
        # non-zero ranks must not race ahead to read best.ckpt while the
        # main process is still writing it (rank-0-only artifact writes)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("joeys2t_train_end")

    if not skip_test:
        ckpt = args.model_dir / "best.ckpt"
        if not ckpt.exists():
            ckpt = args.model_dir / "latest.ckpt"
        model_checkpoint = load_checkpoint(ckpt)
        params = model_checkpoint["model_state"]
        prepared = {
            "model": model, "spec": spec, "params": params, "loss_fn": loss_fn,
            "dev": dev_data, "test": test_data,
        }
        test(cfg=cfg, output_path=(args.model_dir / f"{Path(ckpt).stem}.hyps").as_posix(),
             prepared=prepared)
    else:
        logger.info("Skipping test after training.")
