# coding: utf-8
"""Flagship-dims parity (round-2 verdict item #4): the full
librispeech_100h-sized S2T model (16L enc / 8L dec / h512 / ff2048 /
vocab 5000, ~93M params — /root/reference/configs/librispeech_100h.yaml)
converted from a reference torch build must decode identically in float32
(greedy AND beam, token for token), and the bf16 compute path — what every
converted published checkpoint actually runs in serving — must stay within
a measured, documented drift envelope (docs/parity.md "Quality under
bfloat16").

The rest of the parity suite runs at h=32 / 2 layers; this file pins the
scale that is actually deployed. Contracts:
/root/reference/joeynmt/search.py:21-342 (greedy), :345-825 (beam) at
deployment dims. Random-init weights are the WORST case for decode drift:
near-uniform next-token distributions make argmax maximally sensitive to
round-off, so exact f32 parity here is a strong statement.
"""
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

REF = Path("/root/reference")
needs_ref = pytest.mark.skipif(not REF.is_dir(), reason="reference absent")

torch = pytest.importorskip("torch")

B, S_FRAMES, MAX_LEN, VOCAB = 2, 400, 16, 5000
BEAM_K, ALPHA = 5, 1.0


def _flagship_cfg():
    """librispeech_100h model section dims (16L/8L/h512/ff2048/heads4,
    conv [5,5] x 512ch over 80-dim fbank)."""
    return {
        "encoder": {
            "type": "transformer", "num_layers": 16, "num_heads": 4,
            "hidden_size": 512, "ff_size": 2048, "dropout": 0.0,
            "layer_norm": "pre", "activation": "relu",
            "subsample": True, "in_channels": 80, "conv_channels": 512,
            "conv_kernel_sizes": [5, 5],
            "embeddings": {"embedding_dim": 80, "dropout": 0.0},
        },
        "decoder": {
            "type": "transformer", "num_layers": 8, "num_heads": 4,
            "hidden_size": 512, "ff_size": 2048, "dropout": 0.0,
            "layer_norm": "pre", "activation": "relu",
            "embeddings": {"embedding_dim": 512, "scale": True, "dropout": 0.0},
        },
    }


@pytest.fixture(scope="module")
def flagship(tmp_path_factory):
    """Reference torch model at flagship dims + converted flax params +
    our f32 model, built once for the whole file (93M params)."""
    for mod in ["sentencepiece", "subword_nmt", "subword_nmt.apply_bpe",
                "editdistance", "torchaudio", "torchaudio.compliance",
                "torchaudio.compliance.kaldi", "torchaudio.sox_effects",
                "tqdm"]:
        sys.modules.setdefault(mod, types.ModuleType(mod))
    sys.modules["subword_nmt.apply_bpe"].BPE = object
    sys.modules["subword_nmt.apply_bpe"].create_parser = lambda: None
    if not hasattr(sys.modules["tqdm"], "tqdm"):
        sys.modules["tqdm"].tqdm = lambda *a, **k: a[0] if a else None
    sys.path.insert(0, REF.as_posix())
    from joeynmt.model import build_model as torch_build
    from joeynmt.vocabulary import Vocabulary as TorchVocab

    from joeys2t_tpu.config import SpecialSymbols
    from joeys2t_tpu.convert import torch_state_dict_to_flax
    from joeys2t_tpu.models import build_model as jax_build
    from joeys2t_tpu.vocabulary import Vocabulary

    sym = dict(unk_token="<unk>", pad_token="<pad>", bos_token="<s>",
               eos_token="</s>", sep_token=None, unk_id=0, pad_id=1,
               bos_id=2, eos_id=3, sep_id=None, lang_tags=[])
    tokens = [f"t{i}" for i in range(VOCAB)]
    cfg = _flagship_cfg()
    torch.manual_seed(7)
    tmodel = torch_build(cfg, src_vocab=None,
                         trg_vocab=TorchVocab(tokens, SimpleNamespace(**sym)))
    tmodel.eval()
    n_params = sum(p.numel() for p in tmodel.parameters())
    assert n_params > 90e6, n_params  # really flagship-sized

    jvocab = Vocabulary(tokens, SpecialSymbols())
    jmodel, spec = jax_build(cfg, src_vocab=None, trg_vocab=jvocab)
    params = torch_state_dict_to_flax(
        {k: v.cpu().numpy() for k, v in tmodel.state_dict().items()})

    rng = np.random.RandomState(11)
    src = rng.randn(B, S_FRAMES, 80).astype(np.float32)
    src_length = np.array([S_FRAMES, S_FRAMES - 57])
    return SimpleNamespace(tmodel=tmodel, jmodel=jmodel, spec=spec,
                           params=params, cfg=cfg, src=src,
                           src_length=src_length)


def _torch_encode(fl):
    with torch.no_grad():
        return fl.tmodel._encode(src=torch.tensor(fl.src),
                                 src_length=torch.tensor(fl.src_length),
                                 src_mask=None, task="S2T")


def _jax_encode(fl, params=None, model=None):
    import jax.numpy as jnp
    model = model or fl.jmodel
    return model.apply({"params": params or fl.params}, jnp.asarray(fl.src),
                       jnp.asarray(fl.src_length), None, method="encode")


@needs_ref
def test_flagship_greedy_parity_f32(flagship):
    from joeys2t_tpu.search import greedy as jax_greedy

    from joeynmt.search import greedy as torch_greedy

    enc_t, hid_t, msk_t = _torch_encode(flagship)
    with torch.no_grad():
        out_t, _, _ = torch_greedy(msk_t, MAX_LEN, flagship.tmodel, enc_t, hid_t)

    enc_j, _, msk_j = _jax_encode(flagship)
    np.testing.assert_array_equal(msk_t.numpy(), np.asarray(msk_j))
    # 16 layers of f32 matmuls: round-off grows with depth; 1e-4 on outputs
    # of magnitude O(10) is f32 round-off, not a semantic difference
    np.testing.assert_allclose(enc_t.numpy(), np.asarray(enc_j), atol=1e-4)

    out_j, _, _ = jax_greedy(flagship.params, flagship.jmodel, flagship.spec,
                             enc_j, None, msk_j, MAX_LEN)
    for i in range(B):
        t_row = out_t.numpy()[i]
        eos = np.where(t_row == 3)[0]
        n = (eos[0] + 1) if len(eos) else len(t_row)
        np.testing.assert_array_equal(t_row[:n], np.asarray(out_j)[i, :n])


@needs_ref
def test_flagship_beam_parity_f32(flagship):
    from joeys2t_tpu.search import beam_search as jax_beam

    from joeynmt.search import beam_search as torch_beam

    enc_t, hid_t, msk_t = _torch_encode(flagship)
    with torch.no_grad():
        out_t, sc_t, _ = torch_beam(flagship.tmodel, BEAM_K, enc_t, hid_t,
                                    msk_t, MAX_LEN, n_best=1, alpha=ALPHA,
                                    return_prob="hyp")

    enc_j, _, msk_j = _jax_encode(flagship)
    out_j, sc_j, _ = jax_beam(flagship.params, flagship.jmodel, flagship.spec,
                              enc_j, None, msk_j, BEAM_K, MAX_LEN, ALPHA,
                              n_best=1, return_prob="hyp")
    tn, jn = out_t.numpy(), np.asarray(out_j)
    for i in range(tn.shape[0]):
        eos = np.where(tn[i] == 3)[0]
        n = (eos[0] + 1) if len(eos) else len(tn[i])
        np.testing.assert_array_equal(tn[i][:n], jn[i][:n])
    np.testing.assert_allclose(np.asarray(sc_t).ravel(),
                               np.asarray(sc_j).ravel(), atol=1e-4)


@needs_ref
def test_flagship_bf16_decode_drift(flagship):
    """Measure bf16-vs-f32 decode drift at deployment dims (verdict #4b).

    bf16 is the serving dtype for every converted checkpoint. On a
    random-init model (worst case: near-uniform logits, argmax decides on
    tiny margins) some token flips are expected; the assertion bounds
    catastrophic divergence, and the measured rate is documented in
    docs/parity.md. A trained model's peaked distributions drift far less
    (the fixture-overfit e2e in test_s2t_e2e.py decodes in bf16)."""
    import jax.numpy as jnp

    from joeys2t_tpu.models import build_model as jax_build
    from joeys2t_tpu.search import greedy as jax_greedy
    from joeys2t_tpu.vocabulary import Vocabulary
    from joeys2t_tpu.config import SpecialSymbols

    tokens = [f"t{i}" for i in range(VOCAB)]
    jvocab = Vocabulary(tokens, SpecialSymbols())
    bf16_model, bf16_spec = jax_build(flagship.cfg, src_vocab=None,
                                      trg_vocab=jvocab,
                                      compute_dtype=jnp.bfloat16)

    enc_j, _, msk_j = _jax_encode(flagship)
    out_f32, _, _ = jax_greedy(flagship.params, flagship.jmodel,
                               flagship.spec, enc_j, None, msk_j, MAX_LEN)

    enc_b, _, msk_b = _jax_encode(flagship, model=bf16_model)
    out_bf16, _, _ = jax_greedy(flagship.params, bf16_model, bf16_spec,
                                enc_b, None, msk_b, MAX_LEN)

    a, b = np.asarray(out_f32), np.asarray(out_bf16)
    mismatch = float(np.mean(a != b))
    # encoder-output relative error: the analog drift underneath the flips
    rel = float(np.median(np.abs(np.asarray(enc_b, np.float32) -
                                 np.asarray(enc_j))
                          / (np.abs(np.asarray(enc_j)) + 1e-6)))
    print(f"bf16 drift @93M random-init: token mismatch {mismatch:.3f}, "
          f"median enc rel err {rel:.5f}")
    assert mismatch < 0.9, mismatch  # catastrophic-divergence backstop
    assert rel < 0.05, rel  # bf16 has ~2-3 significant decimal digits
