"""Smoke tests: the shipped examples must run (CPU, no plot)."""

import pathlib
import runpy
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


@pytest.mark.parametrize("script", ["run_kinematic.py", "run_live.py",
                                    "run_bank.py", "run_msckf.py",
                                    "run_mixed_bank.py",
                                    "run_vo_pipeline.py",
                                    "run_compat_migration.py",
                                    "run_car.py", "run_loc.py",
                                    "run_msckf_bank.py"])
@pytest.mark.slow
def test_example_runs(script, monkeypatch, capsys):
  monkeypatch.delenv("PLOT", raising=False)
  sys.path.insert(0, str(EXAMPLES))
  try:
    runpy.run_path(str(EXAMPLES / script), run_name="__main__")
  finally:
    sys.path.pop(0)
  out = capsys.readouterr().out
  assert out.strip()  # printed a summary line
