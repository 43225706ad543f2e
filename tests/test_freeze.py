# coding: utf-8
"""Frozen sub-modules (`freeze: True`) must not change during training
(the reference's freeze_params semantics)."""
import sys
import tempfile
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

from generate_reverse_task import generate_samples  # noqa: E402

from joeys2t_tpu.checkpoints import load_checkpoint  # noqa: E402
from joeys2t_tpu.helpers import make_model_dir  # noqa: E402
from joeys2t_tpu.training import frozen_prefixes, train  # noqa: E402

REPO = Path(__file__).parent.parent


def test_frozen_prefixes():
    cfg = {"encoder": {"freeze": True, "embeddings": {}},
           "decoder": {"embeddings": {"freeze": True}}}
    assert frozen_prefixes(cfg) == {"encoder", "trg_embed"}
    assert frozen_prefixes({}) == set()


def test_frozen_encoder_unchanged():
    tmp = Path(tempfile.mkdtemp())
    data_dir = tmp / "data"
    data_dir.mkdir()
    for split, n, seed in [("train", 120, 1), ("dev", 8, 2)]:
        src, trg = generate_samples(n, high=10, min_len=3, max_len=6, seed=seed)
        (data_dir / f"{split}.src").write_text("\n".join(src) + "\n")
        (data_dir / f"{split}.trg").write_text("\n".join(trg) + "\n")

    cfg = yaml.safe_load(open(REPO / "configs/transformer_reverse.yaml"))
    cfg["model_dir"] = (tmp / "model").as_posix()
    cfg["data"].update(train=(data_dir / "train").as_posix(),
                       dev=(data_dir / "dev").as_posix(),
                       test=(data_dir / "dev").as_posix(),
                       sample_train_subset=-1, sample_dev_subset=-1)
    cfg["training"].update(epochs=1, validation_freq=100, logging_freq=100,
                           batch_size=32, batch_multiplier=1)
    cfg["testing"]["load_model"] = None
    cfg["model"]["tied_embeddings"] = False
    cfg["model"]["tied_softmax"] = False
    for side in ("encoder", "decoder"):
        cfg["model"][side].update(num_layers=1, hidden_size=16, ff_size=32)
        cfg["model"][side]["embeddings"]["embedding_dim"] = 16
    cfg["model"]["encoder"]["freeze"] = True

    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=True)

    ckpt = load_checkpoint(Path(cfg["model_dir"]) / "latest.ckpt")
    params = ckpt["model_state"]

    # re-derive the initial params with the same seed and compare encoders
    import jax

    from joeys2t_tpu.config import parse_global_args
    from joeys2t_tpu.prediction import init_params
    from joeys2t_tpu.models import build_model
    from joeys2t_tpu.vocabulary import Vocabulary
    from joeys2t_tpu.config import SpecialSymbols

    # encoder params must be bit-identical to init; decoder must have moved
    import copy

    args = parse_global_args(copy.deepcopy(
        {k: v for k, v in cfg.items()}), mode="test")
    # rebuild the same model/vocab via the stored vocab files
    from joeys2t_tpu.helpers import read_list_from_file

    src_tokens = read_list_from_file(Path(cfg["model_dir"]) / "src_vocab.txt")
    trg_tokens = read_list_from_file(Path(cfg["model_dir"]) / "trg_vocab.txt")
    sym = SpecialSymbols()
    src_vocab = Vocabulary(src_tokens, sym)
    trg_vocab = Vocabulary(trg_tokens, sym)
    model, spec = build_model(args.model, src_vocab=src_vocab, trg_vocab=trg_vocab)
    init = init_params(model, spec, args, src_vocab, trg_vocab)

    enc_diff = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                   for a, b in zip(jax.tree.leaves(init["encoder"]),
                                   jax.tree.leaves(params["encoder"])))
    dec_diff = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                   for a, b in zip(jax.tree.leaves(init["decoder"]),
                                   jax.tree.leaves(params["decoder"])))
    assert enc_diff == 0.0, f"frozen encoder moved by {enc_diff}"
    assert dec_diff > 0.0, "decoder did not train"
