# coding: utf-8
"""
Legacy recurrent encoder/decoder for MT (counterpart of
joeynmt/encoders.py:38-172 and joeynmt/decoders.py:38-495).

The reference uses cuDNN GRU/LSTM; here the encoder recurrence is a lifted
``nn.scan`` over flax RNN cells (XLA compiles it into a fused loop) with
masked state updates standing in for pack_padded_sequence. Bahdanau (MLP) and
Luong (bilinear) attention per joeynmt/attention.py:26-226.
"""
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from joeys2t_tpu.models.modules import NEG_INF, build_activation


def init_stack_carry(rnn_type: str, num_layers: int, hidden_size: int,
                     batch_size: int, init_hidden: Optional[jnp.ndarray] = None,
                     dtype=jnp.float32):
    """Initial carry for a cell stack; ``init_hidden`` (B, H) seeds every layer
    (joeynmt/decoders.py:469-489). LSTM carry is (c, h), both from the same
    projection (joeynmt/decoders.py:489)."""
    carry = []
    for _ in range(num_layers):
        h = jnp.zeros((batch_size, hidden_size), dtype) if init_hidden is None else init_hidden
        carry.append((h, h) if rnn_type == "lstm" else h)
    return tuple(carry)


class _StackedCells(nn.Module):
    """A stack of GRU/LSTM cells applied per time step, with optional masked
    state updates (padding frames keep the previous state)."""

    rnn_type: str
    hidden_size: int
    num_layers: int
    dropout: float = 0.0

    def setup(self):
        cell_cls = nn.GRUCell if self.rnn_type == "gru" else nn.OptimizedLSTMCell
        self.cells = [
            cell_cls(features=self.hidden_size, name=f"cell_{i}")
            for i in range(self.num_layers)
        ]
        self.dropouts = [
            nn.Dropout(rate=self.dropout) for _ in range(max(self.num_layers - 1, 0))
        ]

    def __call__(self, carry, x, valid=None, deterministic: bool = True):
        """carry: tuple per layer; x: (B, input_size); valid: (B,) bool or None.
        Returns (new_carry, top_out)."""
        new_carry = []
        inp = x
        for i, cell in enumerate(self.cells):
            c, out = cell(carry[i], inp)
            if valid is not None:
                keep = valid[:, None]
                c = jax.tree.map(lambda n, o: jnp.where(keep, n, o), c, carry[i])
                out = jnp.where(keep, out, jnp.zeros_like(out))
            new_carry.append(c)
            if i < self.num_layers - 1:
                out = self.dropouts[i](out, deterministic=deterministic)
            inp = out
        return tuple(new_carry), inp


class RecurrentEncoder(nn.Module):
    """Bidirectional multi-layer RNN encoder (joeynmt/encoders.py:38-172).

    Directions interleave per layer like torch ``nn.GRU/nn.LSTM``
    (bidirectional=True): layer k>0 consumes the concatenation of both
    directions of layer k-1 — required for torch-checkpoint conversion
    parity (joeynmt/encoders.py:75-82 uses torch's packed RNN)."""

    rnn_type: str = "gru"
    hidden_size: int = 1
    emb_size: int = 1
    num_layers: int = 1
    dropout: float = 0.0
    emb_dropout: float = 0.0
    bidirectional: bool = True
    dtype: Any = jnp.float32

    @property
    def output_size(self) -> int:
        return 2 * self.hidden_size if self.bidirectional else self.hidden_size

    def setup(self):
        scan_cls = nn.scan(
            _StackedCells,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=(0, 0, nn.broadcast),
            out_axes=0,
        )
        kwargs = dict(rnn_type=self.rnn_type, hidden_size=self.hidden_size,
                      num_layers=1, dropout=0.0)
        self.fwd_cells = [scan_cls(**kwargs, name=f"fwd_l{i}")
                          for i in range(self.num_layers)]
        if self.bidirectional:
            self.bwd_cells = [scan_cls(**kwargs, name=f"bwd_l{i}")
                              for i in range(self.num_layers)]
        self.emb_dropout_layer = nn.Dropout(rate=self.emb_dropout)
        # torch applies dropout between stacked RNN layers (not after last)
        self.layer_dropouts = [nn.Dropout(rate=self.dropout)
                               for _ in range(max(self.num_layers - 1, 0))]

    def _run(self, cells, x, valid, reverse: bool, deterministic: bool):
        b, t, _ = x.shape
        carry0 = init_stack_carry(self.rnn_type, 1, self.hidden_size, b)
        xs = jnp.moveaxis(x, 1, 0)  # (T, B, E)
        vs = jnp.moveaxis(valid, 1, 0)
        if reverse:
            xs, vs = xs[::-1], vs[::-1]
        carry, outs = cells(carry0, xs, vs, deterministic)
        outs = jnp.moveaxis(outs, 0, 1)  # (B, T, H)
        if reverse:
            outs = outs[:, ::-1]
        return carry, outs

    def __call__(self, src_embed: jnp.ndarray, src_length: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None, src_prompt_embed=None,
                 deterministic: bool = True):
        """Returns (output (B, T, dirs*H), hidden_concat (B, dirs*H), None)."""
        del mask, src_prompt_embed
        x = self.emb_dropout_layer(src_embed, deterministic=deterministic)
        b, t, _ = x.shape
        valid = jnp.arange(t)[None, :] < src_length[:, None]  # (B, T)

        def top_h(carry):
            c = carry[-1]
            return c[1] if isinstance(c, tuple) else c

        fwd_carry = bwd_carry = None
        for i in range(self.num_layers):
            fwd_carry, fwd_out = self._run(self.fwd_cells[i], x, valid, False,
                                           deterministic)
            if self.bidirectional:
                bwd_carry, bwd_out = self._run(self.bwd_cells[i], x, valid,
                                               True, deterministic)
                x = jnp.concatenate([fwd_out, bwd_out], axis=-1)
            else:
                x = fwd_out
            if i < self.num_layers - 1:
                x = self.layer_dropouts[i](x, deterministic=deterministic)

        if self.bidirectional:
            hidden_concat = jnp.concatenate(
                [top_h(fwd_carry), top_h(bwd_carry)], axis=-1)
        else:
            hidden_concat = top_h(fwd_carry)
        return x, hidden_concat, None


class BahdanauAttention(nn.Module):
    """MLP attention (joeynmt/attention.py:26-134)."""

    hidden_size: int

    def setup(self):
        self.key_layer = nn.Dense(self.hidden_size, use_bias=False, name="key_layer")
        self.query_layer = nn.Dense(self.hidden_size, use_bias=False, name="query_layer")
        self.energy_layer = nn.Dense(1, use_bias=False, name="energy_layer")

    def project_keys(self, keys: jnp.ndarray) -> jnp.ndarray:
        return self.key_layer(keys)

    def __call__(self, query: jnp.ndarray, proj_keys: jnp.ndarray,
                 values: jnp.ndarray, mask: jnp.ndarray):
        """query (B,1,Dq), proj_keys (B,S,H), values (B,S,Dv), mask (B,1,S)."""
        proj_query = self.query_layer(query)
        scores = self.energy_layer(jnp.tanh(proj_query + proj_keys))  # (B,S,1)
        scores = jnp.swapaxes(scores, 1, 2)  # (B,1,S)
        scores = jnp.where(mask, scores, NEG_INF)
        alphas = jax.nn.softmax(scores, axis=-1)
        context = alphas @ values  # (B,1,Dv)
        return context, alphas


class LuongAttention(nn.Module):
    """Bilinear attention (joeynmt/attention.py:137-226)."""

    hidden_size: int

    def setup(self):
        self.key_layer = nn.Dense(self.hidden_size, use_bias=False, name="key_layer")

    def project_keys(self, keys: jnp.ndarray) -> jnp.ndarray:
        return self.key_layer(keys)

    def __call__(self, query: jnp.ndarray, proj_keys: jnp.ndarray,
                 values: jnp.ndarray, mask: jnp.ndarray):
        scores = query @ jnp.swapaxes(proj_keys, 1, 2)  # (B,1,S)
        scores = jnp.where(mask, scores, NEG_INF)
        alphas = jax.nn.softmax(scores, axis=-1)
        context = alphas @ values
        return context, alphas


class RecurrentDecoder(nn.Module):
    """Conditional RNN decoder with attention (joeynmt/decoders.py:38-495).

    Training unrolls step-by-step like the reference (decoders.py:408-418);
    search uses ``step`` with explicit (carry, att_vector) state threading.
    """

    rnn_type: str = "gru"
    emb_size: int = 0
    hidden_size: int = 0
    encoder_output_size: int = 0
    attention: str = "bahdanau"
    num_layers: int = 1
    vocab_size: int = 0
    dropout: float = 0.0
    emb_dropout: float = 0.0
    hidden_dropout: float = 0.0
    init_hidden_option: str = "bridge"
    input_feeding: bool = True
    activation: str = "tanh"
    dtype: Any = jnp.float32

    @property
    def output_size(self) -> int:
        return self.vocab_size

    def setup(self):
        self.rnn = _StackedCells(rnn_type=self.rnn_type, hidden_size=self.hidden_size,
                                 num_layers=self.num_layers, dropout=self.dropout,
                                 name="rnn")
        self.att_vector_layer = nn.Dense(self.hidden_size, use_bias=True,
                                         name="att_vector_layer")
        self.output_layer = nn.Dense(self.vocab_size, use_bias=False, name="output_layer")
        if self.attention == "bahdanau":
            self.attention_mech = BahdanauAttention(hidden_size=self.hidden_size,
                                                    name="attention")
        elif self.attention == "luong":
            self.attention_mech = LuongAttention(hidden_size=self.hidden_size,
                                                 name="attention")
        else:
            raise ValueError(f"Unknown attention mechanism: {self.attention}. "
                             "Valid options: 'bahdanau', 'luong'.")
        if self.init_hidden_option == "bridge":
            self.bridge_layer = nn.Dense(self.hidden_size, use_bias=True,
                                         name="bridge_layer")
        self.emb_dropout_layer = nn.Dropout(rate=self.emb_dropout)
        self.hidden_dropout_layer = nn.Dropout(rate=self.hidden_dropout)
        self.act: Callable = build_activation(self.activation)

    def init_hidden(self, encoder_hidden: Optional[jnp.ndarray], batch_size: int):
        """joeynmt/decoders.py:443-489."""
        if self.init_hidden_option == "bridge" and encoder_hidden is not None:
            h = self.act(self.bridge_layer(encoder_hidden))
        elif self.init_hidden_option == "last" and encoder_hidden is not None:
            h = encoder_hidden[:, :self.hidden_size]
        else:
            h = None
        return init_stack_carry(self.rnn_type, self.num_layers, self.hidden_size,
                                batch_size, h)

    def step(self, prev_embed, prev_att_vector, carry, proj_keys, encoder_output,
             src_mask, deterministic: bool = True):
        """One decoder step (joeynmt/decoders.py:230-303). Returns
        (att_vector, carry, att_probs)."""
        if self.input_feeding:
            rnn_input = jnp.concatenate([prev_embed, prev_att_vector], axis=2)
        else:
            rnn_input = prev_embed
        rnn_input = self.emb_dropout_layer(rnn_input, deterministic=deterministic)
        carry, top_out = self.rnn(carry, rnn_input[:, 0, :], deterministic=deterministic)
        query = top_out[:, None, :]  # (B, 1, H)
        context, att_probs = self.attention_mech(query, proj_keys, encoder_output, src_mask)
        att_input = jnp.concatenate([query, context], axis=2)
        att_input = self.hidden_dropout_layer(att_input, deterministic=deterministic)
        att_vector = self.act(self.att_vector_layer(att_input))
        return att_vector, carry, att_probs

    def project_keys(self, encoder_output):
        return self.attention_mech.project_keys(encoder_output)

    def __call__(self, trg_embed, encoder_output, encoder_hidden, src_mask,
                 unroll_steps: int, carry=None, prev_att_vector=None,
                 deterministic: bool = True, **kwargs):
        """Full unroll (training). Returns (outputs, carry, att_probs, att_vectors, None)."""
        b = encoder_output.shape[0]
        if carry is None:
            carry = self.init_hidden(encoder_hidden, b)
        proj_keys = self.project_keys(encoder_output)
        if prev_att_vector is None:
            prev_att_vector = jnp.zeros((b, 1, self.hidden_size))

        att_vectors, att_probs = [], []
        for i in range(unroll_steps):
            prev_embed = trg_embed[:, i:i + 1]
            prev_att_vector, carry, att_prob = self.step(
                prev_embed, prev_att_vector, carry, proj_keys, encoder_output,
                src_mask, deterministic)
            att_vectors.append(prev_att_vector)
            att_probs.append(att_prob)
        att_vectors = jnp.concatenate(att_vectors, axis=1)
        att_probs = jnp.concatenate(att_probs, axis=1)
        outputs = self.output_layer(att_vectors)
        return outputs, carry, att_probs, att_vectors, None
