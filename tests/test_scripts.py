# coding: utf-8
"""Utility-script smoke tests: plot_validations learning curves and the ASR
text normalizer (scripts/ parity with the reference's script set)."""
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
ENV = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
       "MPLBACKEND": "Agg"}


def test_plot_validations(tmp_path):
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "validations.txt").write_text(
        "Steps: 100\tloss: 50.1\tppl: 12.0\tbleu: 10.5\tLR: 0.0003\t*\n"
        "Steps: 200\tloss: 40.2\tppl: 8.0\tbleu: 15.2\tLR: 0.0002\t\n"
        "Steps: 300\tloss: 35.0\tppl: 6.5\tbleu: 18.9\tLR: 0.0001\t*\n")
    out = tmp_path / "curve.png"
    proc = subprocess.run(
        [sys.executable, (REPO / "scripts/plot_validations.py").as_posix(),
         model_dir.as_posix(), "--plot-values", "bleu", "loss",
         "--output-path", out.as_posix()],
        capture_output=True, text=True, env=ENV, timeout=120)
    assert proc.returncode == 0, proc.stderr[-1000:]
    assert out.is_file() and out.stat().st_size > 0


def test_normalizer_numbers_and_punct():
    sys.path.insert(0, (REPO / "scripts").as_posix())
    from normalizer import Normalizer

    norm = Normalizer(lang="en", lowercase=True)
    out = norm("Hello, World! It costs 25 dollars.")
    assert out == out.lower()
    assert "twenty" in out and "five" in out  # 25 -> words
    assert "25" not in out


def test_generate_synthetic_asr_corpus(tmp_path):
    """The synthetic-ASR generator (flagship-scale e2e evidence corpus,
    docs/benchmarks_s2t.md) writes reference-format speech manifests that
    SpeechDataset loads: id|src|n_frames|trg|speaker tsv + .npy features +
    char vocab; splits are disjoint and n_frames matches the arrays."""
    import numpy as np

    out = tmp_path / "corpus"
    proc = subprocess.run(
        [sys.executable,
         (REPO / "scripts/generate_synthetic_asr.py").as_posix(),
         "--out", out.as_posix(), "--train", "12", "--dev", "4",
         "--test", "4", "--seed", "3"],
        capture_output=True, text=True, env=ENV, timeout=300)
    assert proc.returncode == 0, proc.stderr[-1000:]

    texts = {}
    for split, n in [("train", 12), ("dev", 4), ("test", 4)]:
        lines = (out / f"{split}.tsv").read_text().strip().split("\n")
        assert lines[0] == "id\tsrc\tn_frames\ttrg\tspeaker"
        assert len(lines) == n + 1
        for ln in lines[1:]:
            uid, src, n_frames, trg, speaker = ln.split("\t")
            feat = np.load(out / src)
            assert feat.shape == (int(n_frames), 80)
            assert feat.dtype == np.float32
            assert np.isfinite(feat).all()
            texts.setdefault(split, set()).add(trg)
    assert not (texts["train"] & texts["dev"])
    assert not (texts["train"] & texts["test"])
    assert not (texts["dev"] & texts["test"])

    vocab = (out / "char.txt").read_text().strip().split("\n")
    assert vocab[0] == chr(9601) and len(vocab) == 27

    # SpeechDataset consumes the manifest through the real tokenizer stack
    from joeys2t_tpu.data.datasets import build_dataset
    from joeys2t_tpu.tokenizers import build_tokenizer

    data_cfg = {
        "train": (out / "train").as_posix(),
        "dataset_type": "speech",
        "src": {"lang": "en", "level": "frame", "num_freq": 80,
                "min_length": 1, "max_length": 3000,
                "tokenizer_type": "speech", "tokenizer_cfg": {}},
        "trg": {"lang": "en", "level": "char", "lowercase": True,
                "max_length": 512},
    }
    tokenizer = build_tokenizer(data_cfg, task="S2T")
    ds = build_dataset(dataset_type="speech", path=(out / "train").as_posix(),
                       src_lang="src", trg_lang="trg", split="train",
                       tokenizer=tokenizer, sequence_encoder=None, task="S2T")
    assert len(ds) == 12
    idx, feat, trg = ds[0]  # (index, features, char tokens)
    assert feat.shape[1] == 80
    assert len(trg) > 0 and all(isinstance(t, str) for t in trg)


def test_generate_synthetic_mt_corpus(tmp_path):
    """The synthetic-MT generator (flagship-scale MT-leg evidence corpus)
    writes parallel plaintext with disjoint splits, and the target side
    follows the task grammar: every word is a suffixed noun/verb/adjective
    form or a gender particle, and there are exactly as many particles as
    nouns (one inserted after each)."""
    out = tmp_path / "corpus"
    proc = subprocess.run(
        [sys.executable,
         (REPO / "scripts/generate_synthetic_mt.py").as_posix(),
         "--out", out.as_posix(), "--train", "30", "--dev", "6",
         "--test", "6", "--seed", "5"],
        capture_output=True, text=True, env=ENV, timeout=300)
    assert proc.returncode == 0, proc.stderr[-1000:]

    srcs = {}
    for split, n in [("train", 30), ("dev", 6), ("test", 6)]:
        src = (out / f"{split}.src").read_text().strip().split("\n")
        trg = (out / f"{split}.trg").read_text().strip().split("\n")
        assert len(src) == n and len(trg) == n
        srcs[split] = set(src)
        for s, t in zip(src, trg):
            tw = t.split()
            nouns = [w for w in tw if w.endswith("ne")]
            particles = [w for w in tw if w in ("qa", "qe", "qo")]
            others = [w for w in tw
                      if not (w.endswith(("ne", "ve", "va", "vo", "je"))
                              or w in ("qa", "qe", "qo"))]
            assert not others, others
            assert len(particles) == len(nouns) >= 1, t
            # target = source words + one particle per noun
            assert len(tw) == len(s.split()) + len(nouns), (s, t)
    assert not (srcs["train"] & srcs["dev"])
    assert not (srcs["train"] & srcs["test"])


def test_generate_synthetic_st_corpus(tmp_path):
    """The synthetic-ST generator reuses the ASR speech rendering but emits
    TRANSLATED targets: tsv manifests load like speech data, every target
    word is in the emitted vocab, and the translate() rule is chunk-of-3
    reversal plus a length-parity particle (non-monotonic alignment)."""
    import numpy as np

    sys.path.insert(0, (REPO / "scripts").as_posix())
    from generate_synthetic_st import PARTICLES, build_lexicon, translate

    lex = build_lexicon(123)
    src = "the quick brown fox jumps over lazy"
    t = translate(src, lex).split()
    assert t[:3] == [lex["brown"], lex["quick"], lex["the"]]  # chunk reversed
    assert t[3:6] == [lex[w] for w in ["over", "jumps", "fox"]]
    assert t[6] == lex["lazy"]
    assert t[-1] == PARTICLES[7 % 2]

    out = tmp_path / "corpus"
    proc = subprocess.run(
        [sys.executable,
         (REPO / "scripts/generate_synthetic_st.py").as_posix(),
         "--out", out.as_posix(), "--train", "8", "--dev", "3",
         "--test", "3", "--seed", "9"],
        capture_output=True, text=True, env=ENV, timeout=300)
    assert proc.returncode == 0, proc.stderr[-1000:]

    vocab = set((out / "trg_vocab.txt").read_text().split())
    for split, n in [("train", 8), ("dev", 3), ("test", 3)]:
        lines = (out / f"{split}.tsv").read_text().strip().split("\n")
        assert lines[0] == "id\tsrc\tn_frames\ttrg\tspeaker"
        assert len(lines) == n + 1
        for ln in lines[1:]:
            uid, src_p, n_frames, trg, speaker = ln.split("\t")
            feat = np.load(out / src_p)
            assert feat.shape == (int(n_frames), 80)
            assert set(trg.split()) <= vocab
            assert trg.split()[-1] in PARTICLES
