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
