# coding: utf-8
"""
Model facade + builder (TPU-native counterpart of joeynmt/model.py).

The reference funnels every call through ``Model.forward(return_type=...)`` so
torch DataParallel can wrap one callable (joeynmt/model.py:95-168). Under
jit/pjit no such funnel is needed: ``Seq2SeqModel`` exposes pure methods
(``encode``, ``decode``, ``__call__``, ``init_cache``, ``decode_step``) that
train/eval steps close over via ``model.apply(..., method=...)``.
"""
import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from joeys2t_tpu.config import ConfigurationError
from joeys2t_tpu.models.decoders import TransformerDecoder
from joeys2t_tpu.models.embeddings import Embeddings
from joeys2t_tpu.models.encoders import ConformerEncoder, TransformerEncoder
from joeys2t_tpu.models.rnn import RecurrentDecoder, RecurrentEncoder
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static (non-pytree) metadata for a built model: special-symbol ids and
    task info threaded through search/training (joeynmt/model.py:60-68)."""

    task: str
    pad_index: int
    bos_index: int
    eos_index: int
    unk_index: int
    sep_index: Optional[int]
    specials: Tuple[int, ...]
    lang_tags: Tuple[int, ...]
    src_vocab_size: Optional[int]
    trg_vocab_size: int
    # loss configuration (set from train cfg; joeynmt/model.py:74-93)
    loss_type: str = "crossentropy"
    label_smoothing: float = 0.0
    ctc_weight: float = 0.0

    @property
    def forbidden_at_generation(self) -> Tuple[int, ...]:
        """Tokens never generated: bos, sep, lang_tags (joeynmt/search.py:288)."""
        forbidden = [self.bos_index]
        if self.sep_index is not None:
            forbidden.append(self.sep_index)
        return tuple(forbidden) + tuple(self.lang_tags)


class Seq2SeqModel(nn.Module):
    """Encoder-decoder model. For S2T, src inputs are fbank features and
    ``src_embed`` is None (joeynmt/model.py:396: src_embed = nn.Identity())."""

    encoder: nn.Module
    decoder: nn.Module
    trg_embed: Embeddings
    src_embed: Optional[Embeddings] = None
    task: str = "MT"
    tied_softmax: bool = False

    def _embed_src(self, src: jnp.ndarray) -> jnp.ndarray:
        if self.src_embed is None:  # S2T: identity over fbank features
            return src
        return self.src_embed(src)

    def _output_logits(self, out: jnp.ndarray) -> jnp.ndarray:
        """Apply tied-softmax projection if configured (joeynmt/model.py:482-490)."""
        if self.tied_softmax:
            return self.trg_embed.attend(out)
        return out

    # ------------------------------------------------------------------ encode
    def encode(
        self,
        src: jnp.ndarray,
        src_length: jnp.ndarray,
        src_mask: Optional[jnp.ndarray] = None,
        src_prompt_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Returns (encoder_output, encoder_hidden, src_mask)
        (joeynmt/model.py:211-239)."""
        src_prompt_embed = None
        if src_prompt_mask is not None and self.src_embed is not None:
            src_prompt_embed = self.src_embed(src_prompt_mask)
        out, hidden, out_mask = self.encoder(self._embed_src(src), src_length, src_mask,
                                             src_prompt_embed=src_prompt_embed,
                                             deterministic=deterministic)
        # recurrent encoders don't produce a mask; keep the batch one
        if out_mask is None:
            out_mask = src_mask
        return out, hidden, out_mask

    # ------------------------------------------- pipeline-parallel encode split
    def encode_pre_layers(
        self,
        src: jnp.ndarray,
        src_length: jnp.ndarray,
        src_mask: Optional[jnp.ndarray] = None,
        src_prompt_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Encoder prologue (subsample/embed/PE/dropout), stopping before the
        layer stack — the GPipe path (training._loss_and_metrics_pp) runs the
        stack via parallel.pp.pipeline_apply. Returns (x, mask)."""
        src_prompt_embed = None
        if src_prompt_mask is not None and self.src_embed is not None:
            src_prompt_embed = self.src_embed(src_prompt_mask)
        return self.encoder.pre_layers(
            self._embed_src(src), src_length, src_mask,
            src_prompt_embed=src_prompt_embed, deterministic=deterministic)

    def encode_post_layers(self, x: jnp.ndarray) -> jnp.ndarray:
        """Encoder epilogue (final layer norm) after the pipelined stack."""
        return self.encoder.post_layers(x)

    # ------------------------------------------- pipeline-parallel decode split
    def decode_pre_layers(
        self,
        trg_input: jnp.ndarray,
        trg_mask: jnp.ndarray,
        trg_prompt_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Decoder prologue (embed/PE/prompt/dropout + causal mask), stopping
        before the layer stack. Returns (x, full_trg_mask)."""
        trg_prompt_embed = None
        if trg_prompt_mask is not None:
            trg_prompt_embed = self.trg_embed(trg_prompt_mask)
        return self.decoder.pre_layers(
            self.trg_embed(trg_input), trg_mask,
            trg_prompt_embed=trg_prompt_embed, deterministic=deterministic)

    def decode_post_layers(self, x: jnp.ndarray, encoder_output: jnp.ndarray):
        """Decoder epilogue after the pipelined stack: final norm, output
        projection (incl. tied softmax), CTC head. Returns (logits, ctc)."""
        out, ctc_out = self.decoder.post_layers(x, encoder_output)
        return self._output_logits(out), ctc_out

    # ------------------------------------------------------------------ decode
    def decode(
        self,
        trg_input: jnp.ndarray,
        encoder_output: jnp.ndarray,
        src_mask: Optional[jnp.ndarray],
        trg_mask: Optional[jnp.ndarray],
        encoder_hidden: Optional[jnp.ndarray] = None,
        trg_prompt_mask: Optional[jnp.ndarray] = None,
        unroll_steps: Optional[int] = None,
        return_attention: bool = False,
        deterministic: bool = True,
    ):
        """Full teacher-forced decode. Returns
        (logits, hidden, att, None, ctc_logits) (joeynmt/model.py:241-294)."""
        trg_embed = self.trg_embed(trg_input)
        if isinstance(self.decoder, RecurrentDecoder):
            steps = unroll_steps if unroll_steps is not None else trg_input.shape[1]
            out, hidden, att, att_vectors, _ = self.decoder(
                trg_embed=trg_embed, encoder_output=encoder_output,
                encoder_hidden=encoder_hidden, src_mask=src_mask,
                unroll_steps=steps, deterministic=deterministic)
            return out, hidden, att, att_vectors, None
        trg_prompt_embed = None
        if trg_prompt_mask is not None:
            trg_prompt_embed = self.trg_embed(trg_prompt_mask)
        out, x, att, _, ctc_out = self.decoder(
            trg_embed=trg_embed, encoder_output=encoder_output, src_mask=src_mask,
            trg_mask=trg_mask, trg_prompt_embed=trg_prompt_embed,
            return_attention=return_attention, deterministic=deterministic)
        return self._output_logits(out), x, att, None, ctc_out

    # ------------------------------------------------------------- full fwd
    def __call__(
        self,
        src: jnp.ndarray,
        trg_input: jnp.ndarray,
        src_length: jnp.ndarray,
        src_mask: Optional[jnp.ndarray] = None,
        trg_mask: Optional[jnp.ndarray] = None,
        src_prompt_mask: Optional[jnp.ndarray] = None,
        trg_prompt_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Encode + decode; returns (logits, ctc_logits, src_mask)
        (joeynmt/model.py:170-209)."""
        encoder_output, encoder_hidden, src_mask = self.encode(
            src, src_length, src_mask, src_prompt_mask, deterministic=deterministic)
        logits, _, _, _, ctc_logits = self.decode(
            trg_input, encoder_output, src_mask, trg_mask,
            encoder_hidden=encoder_hidden, trg_prompt_mask=trg_prompt_mask,
            unroll_steps=trg_input.shape[1], deterministic=deterministic)
        return logits, ctc_logits, src_mask

    # ------------------------------------------------------------ decode (AR)
    def init_cache(self, encoder_output: jnp.ndarray, max_len: int,
                   cache_dtype: Any = None,
                   src_valid: Optional[jnp.ndarray] = None) -> Dict:
        return self.decoder.init_cache(encoder_output, max_len, cache_dtype,
                                       src_valid=src_valid)

    def decode_step(
        self,
        prev_tokens: jnp.ndarray,  # (B, 1) int32
        index: jnp.ndarray,
        cache: Dict,
        src_mask: Optional[jnp.ndarray],
        trg_prompt_mask_t: Optional[jnp.ndarray] = None,  # (B, 1) int32 0/1
        return_attention: bool = False,
        beam_k: int = 1,
        ancestry: Optional[jnp.ndarray] = None,
    ):
        """One KV-cached decode step -> (logits (B, 1, V), new_cache, att).

        ``beam_k > 1``: prev_tokens/self-caches carry B*K rows while the
        cross caches and src_mask stay untiled at B — cross-attention K/V
        are shared across a batch element's beams (k-fold less HBM
        traffic than tiling them)."""
        trg_embed_t = self.trg_embed(prev_tokens)
        trg_prompt_embed_t = None
        if trg_prompt_mask_t is not None:
            trg_prompt_embed_t = self.trg_embed(trg_prompt_mask_t)
        logits, cache, att = self.decoder.decode_step(
            trg_embed_t, index, cache, src_mask,
            trg_prompt_embed_t=trg_prompt_embed_t,
            return_attention=return_attention, beam_k=beam_k,
            ancestry=ancestry)
        return self._output_logits(logits), cache, att


def build_model(cfg: Dict = None, src_vocab=None, trg_vocab=None,
                compute_dtype: Any = jnp.float32) -> Tuple[Seq2SeqModel, ModelSpec]:
    """Build model modules from the `model` config section
    (joeynmt/model.py:366-506). Initialization happens separately via
    joeys2t_tpu.models.initialization.initialize_model on the param pytree."""
    logger.info("Building an encoder-decoder model...")
    enc_cfg = cfg["encoder"]
    dec_cfg = cfg["decoder"]

    task = "MT" if src_vocab is not None else "S2T"
    trg_pad_index = trg_vocab.pad_index
    src_pad_index = src_vocab.pad_index if task == "MT" else trg_pad_index

    # DeepNet alpha for residual scaling when using xavier_normal init
    # (joeynmt/initialization.py:137-152; applied at construction here because
    # flax module attributes are static)
    enc_alpha, dec_alpha = 1.0, 1.0
    if (cfg.get("initializer", "xavier_uniform") == "xavier_normal"
            and enc_cfg.get("type", "transformer") == "transformer"
            and dec_cfg.get("type", "transformer") == "transformer"):
        from joeys2t_tpu.models.initialization import compute_alpha_beta

        ab = compute_alpha_beta(enc_cfg["num_layers"], dec_cfg["num_layers"])
        enc_alpha = ab["alpha"]["encoder"]
        dec_alpha = ab["alpha"]["decoder"]

    if task == "MT":
        src_embed = Embeddings(
            vocab_size=len(src_vocab), padding_idx=src_pad_index,
            **{k: v for k, v in enc_cfg["embeddings"].items()
               if k in ("embedding_dim", "scale", "freeze")})
    else:
        src_embed = None

    tied_embeddings = cfg.get("tied_embeddings", False)
    if tied_embeddings:
        if task == "MT" and src_vocab == trg_vocab:
            trg_embed = src_embed  # same instance => linen shares the params
        else:
            raise ConfigurationError("Embedding cannot be tied since vocabularies differ.")
    else:
        trg_embed = Embeddings(
            vocab_size=len(trg_vocab), padding_idx=trg_pad_index,
            **{k: v for k, v in dec_cfg["embeddings"].items()
               if k in ("embedding_dim", "scale", "freeze")})

    # ------------------------------------------------------------- encoder
    enc_dropout = enc_cfg.get("dropout", 0.0)
    enc_emb_dropout = enc_cfg["embeddings"].get("dropout", enc_dropout)
    enc_type = enc_cfg.get("type", "transformer")
    if enc_type not in ["recurrent", "transformer", "conformer"]:
        raise ConfigurationError(
            "Invalid encoder type. Valid options: {`recurrent`, `transformer`, `conformer`}.")
    if enc_type in ("transformer", "conformer"):
        if task == "MT":
            assert enc_cfg["embeddings"]["embedding_dim"] == enc_cfg["hidden_size"], (
                "for transformer, emb_size must be the same as hidden_size.")
        attn_impl = cfg.get("attention_impl", enc_cfg.get("attention_impl", "auto"))
        common = dict(
            attn_impl=attn_impl,
            remat=bool(cfg.get("remat", enc_cfg.get("remat", False))),
            sequence_parallel=bool(cfg.get("sequence_parallel", False)),
            hidden_size=enc_cfg["hidden_size"],
            ff_size=enc_cfg["ff_size"],
            num_layers=enc_cfg["num_layers"],
            num_heads=enc_cfg["num_heads"],
            dropout=enc_dropout,
            emb_dropout=enc_emb_dropout,
            layer_norm_position=enc_cfg.get("layer_norm", "pre"),
            alpha=enc_alpha,
            pad_index=src_pad_index,
            dtype=compute_dtype,
        )
        subsample = enc_cfg.get("subsample", False)
        if subsample or enc_type == "conformer":
            common.update(
                in_channels=enc_cfg["in_channels"],
                conv_channels=enc_cfg["conv_channels"],
                conv_kernel_sizes=tuple(enc_cfg.get("conv_kernel_sizes", [3, 3])),
            )
        if enc_type == "conformer":
            encoder = ConformerEncoder(
                depthwise_conv_kernel_size=enc_cfg.get("depthwise_conv_kernel_size", 31),
                conv_norm_type=enc_cfg.get("conv_norm", "layernorm"),
                macaron=enc_cfg.get("macaron", "reference"),
                layerscale_init=float(enc_cfg.get("layerscale", 0.0)),
                **common)
        else:
            encoder = TransformerEncoder(
                activation=enc_cfg.get("activation", "relu"),
                num_experts=int(enc_cfg.get("num_experts", 0)),
                subsample=subsample, **common)
    else:
        assert task == "MT", "RNN model not supported for s2t task. use transformer."
        encoder = RecurrentEncoder(
            rnn_type=enc_cfg.get("rnn_type", "gru"),
            hidden_size=enc_cfg["hidden_size"],
            emb_size=enc_cfg["embeddings"]["embedding_dim"],
            num_layers=enc_cfg.get("num_layers", 1),
            dropout=enc_dropout,
            emb_dropout=enc_emb_dropout,
            bidirectional=enc_cfg.get("bidirectional", True),
            dtype=compute_dtype,
        )

    # ------------------------------------------------------------- decoder
    dec_dropout = dec_cfg.get("dropout", 0.0)
    dec_emb_dropout = dec_cfg["embeddings"].get("dropout", dec_dropout)
    dec_type = dec_cfg.get("type", "transformer")
    if dec_type not in ["recurrent", "transformer"]:
        raise ConfigurationError(
            "Invalid decoder type. Valid options: {`transformer`, `recurrent`}.")

    tied_softmax = cfg.get("tied_softmax", False)
    if tied_softmax:
        if dec_cfg["embeddings"]["embedding_dim"] != dec_cfg["hidden_size"]:
            raise ConfigurationError(
                "For tied_softmax, the decoder embedding_dim and decoder hidden_size "
                "must be the same. The decoder must be a Transformer.")

    if dec_type == "transformer":
        decoder = TransformerDecoder(
            num_layers=dec_cfg["num_layers"],
            num_heads=dec_cfg["num_heads"],
            hidden_size=dec_cfg["hidden_size"],
            ff_size=dec_cfg["ff_size"],
            dropout=dec_dropout,
            emb_dropout=dec_emb_dropout,
            vocab_size=len(trg_vocab),
            layer_norm_position=dec_cfg.get("layer_norm", "post"),
            activation=dec_cfg.get("activation", "relu"),
            alpha=dec_alpha,
            ctc_layer=(task == "S2T"),  # joeynmt/model.py:452-454
            tied_softmax=tied_softmax,
            attn_impl=cfg.get("attention_impl", dec_cfg.get("attention_impl", "auto")),
            cache_cross_int8=bool(cfg.get("cache_cross_int8",
                                          dec_cfg.get("cache_cross_int8", False))),
            cache_self_int8=bool(cfg.get("cache_self_int8",
                                         dec_cfg.get("cache_self_int8", False))),
            remat=bool(cfg.get("remat", dec_cfg.get("remat", False))),
            sequence_parallel=bool(cfg.get("sequence_parallel", False)),
            dtype=compute_dtype,
        )
    else:
        decoder = RecurrentDecoder(
            rnn_type=dec_cfg.get("rnn_type", "gru"),
            emb_size=dec_cfg["embeddings"]["embedding_dim"],
            hidden_size=dec_cfg["hidden_size"],
            encoder_output_size=encoder.output_size,
            attention=dec_cfg.get("attention", "bahdanau"),
            num_layers=dec_cfg.get("num_layers", 1),
            vocab_size=len(trg_vocab),
            dropout=dec_dropout,
            emb_dropout=dec_emb_dropout,
            hidden_dropout=dec_cfg.get("hidden_dropout", 0.0),
            init_hidden_option=dec_cfg.get("init_hidden", "bridge"),
            input_feeding=dec_cfg.get("input_feeding", True),
            activation=dec_cfg.get("activation", "tanh"),
            dtype=compute_dtype,
        )

    model = Seq2SeqModel(
        encoder=encoder,
        decoder=decoder,
        src_embed=src_embed,
        trg_embed=trg_embed,
        task=task,
        tied_softmax=tied_softmax,
    )
    spec = ModelSpec(
        task=task,
        pad_index=trg_vocab.pad_index,
        bos_index=trg_vocab.bos_index,
        eos_index=trg_vocab.eos_index,
        unk_index=trg_vocab.unk_index,
        sep_index=trg_vocab.sep_index,
        specials=tuple(trg_vocab.lookup(t) for t in trg_vocab.specials),
        lang_tags=tuple(trg_vocab.lookup(t) for t in trg_vocab.lang_tags),
        src_vocab_size=len(src_vocab) if src_vocab is not None else None,
        trg_vocab_size=len(trg_vocab),
    )
    logger.info("Enc-dec model built.")
    return model, spec
