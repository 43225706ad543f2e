# coding: utf-8
"""Test configuration: run JAX on a virtual 8-device CPU mesh so that
multi-device sharding paths are exercised without TPU hardware
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count=8).

Note: the environment's sitecustomize registers an `axon` TPU backend and
appends it to jax_platforms at interpreter start; the config.update below
overrides that so tests stay on the virtual CPU mesh.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_llvm_disable_expensive_passes" not in _flags:
    # tests compile hundreds of tiny graphs on one CPU core; the expensive
    # LLVM passes buy runtime that no 16-hidden model ever recoups. FP
    # semantics are unchanged (no fast-math), so golden/parity values hold.
    _flags = (_flags + " --xla_llvm_disable_expensive_passes=true").strip()
if "xla_backend_optimization_level" not in _flags:
    # same trade at the HLO level: opt level 0 cuts compile wall ~30% on
    # the compile-bound e2e tests (rnn_reverse: 75s -> 50s) and the tiny
    # test models never recoup the lost runtime. No fast-math here either;
    # the golden/parity modules (loss, audio, flash, search) stay green —
    # re-verify them if this flag ever changes.
    _flags = (_flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = _flags

# Persistent XLA compilation cache for the suite. The e2e modules call
# train()/predict() many times, and every call builds NEW jit closures, so
# the in-process jit cache never dedupes their (identical-HLO) graphs — on
# this 1-core host each recompile costs seconds to minutes. The on-disk
# cache dedupes by HLO hash: repeat train() calls, the 2-process multihost
# children (they inherit the env var), and repeat `make test`/`make
# test-fast` runs all hit it. Executables are bit-identical to a fresh
# compile, so golden/parity values are unaffected. scripts/test_budget.py
# overrides the env var with a fresh empty dir so the budget gate always
# measures a cold-cache run.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
if not _cache_dir:
    _cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".jax_cache")
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
# XLA:CPU logs a spurious per-load ERROR about the "prefer-no-scatter"/
# "prefer-no-gather" compile PREFERENCES not being host machine FEATURES
# when it loads a cached executable (same machine compiled it; the load
# succeeds). Silence the C++ log stream; real failures still raise.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _cache_dir)

from pathlib import Path  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Modules dominated by e2e CLI training, multi-process SPMD spawns, or
# torch-oracle parity at realistic sizes — excluded from `make test-fast`
# (the <=3-min inner-loop gate); `make ci` still runs everything.
_SLOW_MODULES = {
    "test_multihost",         # spawns 2-process jax.distributed runs
    "test_s2t_e2e",           # full CLI train->test cycles on fbank data
    "test_training_e2e",      # full CLI train cycles
    "test_parity_torch",      # torch oracle + zoo transport chains
    "test_parity_flagship",   # 93M-dim converted-checkpoint decode parity
    "test_tensor_parallel",   # TrainManager-from-config on the 8-dev mesh
    "test_pipeline_parallel",  # GPipe TrainManager equivalence runs
    "test_scripts",           # corpus generators + data-prep CLIs
    "test_serving",           # wav->text Transcriber e2e (80s+ fixture build)
    "test_hub_interface",     # generate()/CLI-translate e2e on a built model
    "test_moe",               # MoE training-signal runs on the 8-dev mesh
    "test_freeze",            # multi-step frozen-encoder training runs
}

# Individual heavy tests inside otherwise-fast unit modules (training runs
# or realistic-size forwards, 10-55s each on the single-core CPU mesh);
# everything else in their modules stays in the fast gate.
_SLOW_TESTS = {
    ("test_model_forward", "TestRemat"),              # fwd+bwd bit-parity, 54s
    ("test_model_forward", "test_rnn_forward"),       # stacked-RNN fwd, 23s
    ("test_model_forward", "test_macaron_paper_trains"),  # 22s training run
    ("test_rnn_attention", "TestLuongRecurrentModel"),    # greedy e2e, 13s
    ("test_sharded_checkpoint", "test_tp_sharded_round_trip"),  # 11s
    ("test_prompts", "test_forced_prompt_decoding_through_predict"),  # 11s
    ("test_loss", "TestCTCGradients"),                # finite-diff CTC, 4s
    ("test_loss", "test_gradients_match"),            # CTC grad oracle, 7s
    ("test_flash_attention", "TestWideModelDispatch"),     # per-head path, 7s
    ("test_flash_attention", "TestLongSequenceDispatch"),  # S>=1024 path, 7s
    ("test_search", "TestRecurrentGreedy"),           # RNN greedy e2e, 5s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.fspath.purebasename
        if name in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
            continue
        for part in item.nodeid.split("::")[1:]:
            if (name, part.split("[")[0]) in _SLOW_TESTS:
                item.add_marker(pytest.mark.slow)
                break


@pytest.fixture(scope="session")
def trained_s2t(tmp_path_factory):
    """ONE trained tiny-S2T snapshot shared by the e2e modules.

    Returns (workdir, pristine_cfg, model_dir): the config is the pristine
    pre-train() copy (train() resolves paths and dataclasses in place), the
    model_dir holds ckpts/vocab/validations/hypotheses from a full
    train -> validate -> test cycle. Consumers must treat the directory as
    read-only apart from additive writes (e.g. dumping a config.yaml).
    """
    from s2t_fixtures import REF_SPEECH, s2t_cfg

    if not REF_SPEECH.is_dir():
        pytest.skip("reference fixtures absent")
    import copy

    from joeys2t_tpu.helpers import make_model_dir
    from joeys2t_tpu.training import train

    tmp = tmp_path_factory.mktemp("s2t_shared")
    cfg = s2t_cfg(tmp)
    pristine = copy.deepcopy(cfg)
    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=False)
    return tmp, pristine, Path(cfg["model_dir"])
