"""Console entry point (reference pyproject.toml:21-22 scripts parity)."""
import matplotlib
matplotlib.use("Agg")

from ssqueeze_rs_tpu.cli import main


def test_bare_prints_hello(capsys):
    assert main([]) == 0
    assert "ssqueeze" in capsys.readouterr().out


def test_info(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "ssqueeze_rs_tpu 0" in out and "native host runtime" in out


def test_demo_runs_headless():
    assert main(["demo", "am_cosine", "-N", "512"]) == 0
