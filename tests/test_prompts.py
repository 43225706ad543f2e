# coding: utf-8
"""Prompting / multilingual tests: <sep>-delimited prompts, language tags,
prompt masks, forced decoding through the full predict path (mirrors
test/unit/test_data.py TestTsvPromptDataset + test_search prompt cases)."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joeys2t_tpu.config import parse_special_symbols, TestConfig
from joeys2t_tpu.data.loader import load_data
from joeys2t_tpu.losses import XentLoss
from joeys2t_tpu.models import build_model
from joeys2t_tpu.prediction import predict

REF_DATA = Path("/root/reference/test/data")
needs_ref = pytest.mark.skipif(not REF_DATA.is_dir(), reason="reference fixtures absent")


def prompt_cfg():
    return {
        "dev": (REF_DATA / "toy/dev").as_posix(),
        "src": {"lang": "src", "level": "word", "lowercase": False, "max_length": 30,
                "voc_file": (REF_DATA / "toy/bpe200.txt").as_posix()},
        "trg": {"lang": "trg", "level": "word", "lowercase": False, "max_length": 30,
                "voc_file": (REF_DATA / "toy/bpe200.txt").as_posix()},
        "dataset_type": "tsv",
        "special_symbols": parse_special_symbols({
            "unk_token": "<unk>", "unk_id": 0, "pad_token": "<pad>", "pad_id": 1,
            "bos_token": "<s>", "bos_id": 2, "eos_token": "</s>", "eos_id": 3,
            "sep_token": "<sep>", "sep_id": 4, "lang_tags": ["<de>", "<en>"],
        }),
    }


@needs_ref
class TestPromptData:
    def test_tsv_prompt_columns_detected(self):
        _, trg_vocab, _, dev, _ = load_data(prompt_cfg(), datasets=["dev"], task="MT")
        assert dev.has_prompt["src"] and dev.has_prompt["trg"]
        # vocab carries sep + lang tags
        assert trg_vocab.sep_index == 4
        assert trg_vocab.lookup("<de>") == 5
        assert trg_vocab.lookup("<en>") == 6

    def test_prompt_concatenation(self):
        """item = prompt + <sep> + text (joeynmt/datasets.py:105-140)."""
        _, _, _, dev, _ = load_data(prompt_cfg(), datasets=["dev"], task="MT")
        idx, src, trg = dev[1]
        assert "<sep>" in src and "<sep>" in trg
        sep_pos = src.index("<sep>")
        assert src[0] == "<de>"  # prompt with lang tag comes first
        assert trg[0] == "<en>"

    def test_prompt_mask_in_batch(self):
        _, trg_vocab, _, dev, _ = load_data(prompt_cfg(), datasets=["dev"], task="MT")
        it = dev.make_iter(batch_size=4, seed=42, shuffle=False,
                           pad_index=1, eos_index=3)
        batch = next(iter(it))
        assert batch.src_prompt_mask is not None
        assert batch.trg_prompt_mask is not None
        # mask is 1 up to and including <sep>, 0 after
        for i in range(batch.nseqs):
            row = batch.src[i]
            mask = batch.src_prompt_mask[i]
            sep_positions = np.where(row == 4)[0]
            assert len(sep_positions) >= 1
            sep = sep_positions[0]
            assert mask[: sep + 1].all()
            assert not mask[sep + 1:].any()

    def test_forced_prompt_decoding_through_predict(self):
        """Prompted examples force the decoder prefix (joeynmt/search.py:228-317
        via prediction)."""
        src_vocab, trg_vocab, _, dev, _ = load_data(prompt_cfg(), datasets=["dev"],
                                                    task="MT")
        cfg = {
            "encoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                        "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                        "embeddings": {"embedding_dim": 16, "scale": True},
                        "layer_norm": "pre"},
            "decoder": {"type": "transformer", "num_layers": 2, "num_heads": 2,
                        "hidden_size": 16, "ff_size": 32, "dropout": 0.0,
                        "embeddings": {"embedding_dim": 16, "scale": True},
                        "layer_norm": "pre"},
        }
        model, spec = build_model(cfg, src_vocab=src_vocab, trg_vocab=trg_vocab)
        params = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.ones((2, 5), jnp.int32),
            jnp.ones((2, 4), jnp.int32), jnp.full((2,), 5, jnp.int32),
            jnp.ones((2, 1, 5), bool), jnp.ones((2, 1, 4), bool))["params"]
        loss_fn = XentLoss(pad_index=spec.pad_index, smoothing=0.0)
        args = TestConfig(batch_size=4, batch_type="sentence", max_output_length=20,
                          eval_metrics=["bleu"], beam_size=1, n_best=1)
        scores, refs, hyps, raw, _, _ = predict(
            params=params, model=model, spec=spec, data=dev, loss_fn=loss_fn,
            compute_loss=False, args=args)
        assert len(hyps) == len(dev)
        # the trg prompt (before <sep>) is cut off in post-processing
        for hyp in hyps:
            assert "<sep>" not in hyp


@needs_ref
class TestHuggingfaceDataset:
    def test_local_hf_translation_dataset(self, tmp_path):
        """HuggingfaceTranslationDataset over a locally-saved dataset
        (joeynmt/datasets.py:972-1027) — no network needed."""
        import datasets as hf

        data = hf.Dataset.from_dict({
            "translation": [{"de": "hallo welt", "en": "hello world"},
                            {"de": "guten tag", "en": "good day"}] * 4,
        })
        data = data.cast_column("translation",
                                hf.features.Translation(languages=["de", "en"]))
        path = tmp_path / "hfds"
        data.save_to_disk(path.as_posix())

        cfg = {
            "train": path.as_posix(),
            "dataset_type": "huggingface",
            "dataset_cfg": {"split": "train"},
            "src": {"lang": "de", "level": "word", "max_length": 20},
            "trg": {"lang": "en", "level": "word", "max_length": 20},
            "special_symbols": parse_special_symbols({}),
        }
        src_vocab, trg_vocab, train, _, _ = load_data(cfg, datasets=["train"],
                                                      task="MT")
        assert len(train) == 8
        idx, src, trg = train[0]
        assert src == ["hallo", "welt"]
        assert trg == ["hello", "world"]
        it = train.make_iter(batch_size=4, seed=1, shuffle=True,
                             pad_index=1, eos_index=3)
        batch = next(iter(it))
        assert batch.nseqs == 4


@needs_ref
class TestPromptTruncation:
    def test_long_prompt_truncated_keeps_lang_tag(self):
        """When prompt + item exceed max_length, the prompt is cut from the
        left but a leading language tag is preserved
        (joeynmt/datasets.py:121-133)."""
        cfg = prompt_cfg()
        cfg["src"]["max_length"] = 12
        cfg["trg"]["max_length"] = 12
        from joeys2t_tpu.data.loader import load_data

        _, _, _, dev, _ = load_data(cfg, datasets=["dev"], task="MT")
        cfg_wide = prompt_cfg()
        _, _, _, dev_wide, _ = load_data(cfg_wide, datasets=["dev"], task="MT")

        found_truncated = False
        for i in range(len(dev)):
            src = dev.get_item(i, dev.src_lang, is_train=False)
            wide = dev_wide.get_item(i, dev_wide.src_lang, is_train=False)
            if "<sep>" not in src:
                continue
            sep, sep_wide = src.index("<sep>"), wide.index("<sep>")
            item_len = len(src) - sep - 1
            # prompt bounded so prompt + sep + item <= max_length (when the
            # item fits); only the prompt is cut, from the left
            if item_len + 1 < 12:
                assert sep <= 12 - item_len - 1, (sep, src)
            assert src[sep + 1:] == wide[sep_wide + 1:]  # item untouched
            if sep < sep_wide:
                found_truncated = True
                if wide[0] in ("<de>", "<en>"):  # lang tag survives the cut
                    assert src[0] == wide[0]
        assert found_truncated
