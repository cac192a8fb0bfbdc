"""CLI smoke tests — the ray-job-submit entry point (SURVEY §3.1/§2.5).

The CLI owns its Ray session in a real deployment; under pytest the
session fixture already holds one, and _init_ray's ignore_reinit_error
makes the reuse safe. Subprocess isolation would double-init Ray per
test, so these call main() in-process."""

import json
import os

import numpy as np
import pandas as pd

from flashray.cli import main


def _write_transcripts(path):
    from flashray import fixtures

    fixtures.write_transcripts(path, "unit")
    return path


def test_cli_build_and_run(tmp_path, capsys):
    tpath = _write_transcripts(str(tmp_path / "t.parquet"))
    gpath = str(tmp_path / "graph")
    rc = main(
        [
            "build",
            "--transcripts", tpath,
            "--out", gpath,
            "--partitions", "2",
            "--symmetrize",
        ]
    )
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["edges"] > 0
    assert os.path.exists(os.path.join(gpath, "meta.json"))

    out_dir = str(tmp_path / "pr_out")
    rc = main(
        [
            "run",
            "--graph", gpath,
            "--algorithm", "pagerank",
            "--out", out_dir,
        ]
    )
    assert rc == 0
    ran = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # with --out the run reports the written path; verify the parquet
    assert ran["result"] == out_dir
    import pyarrow.parquet as pq

    vals = pq.read_table(out_dir).to_pandas()
    assert len(vals) == built["vertices"]


def test_cli_run_wcc_stdout(tmp_path, capsys):
    tpath = _write_transcripts(str(tmp_path / "t.parquet"))
    gpath = str(tmp_path / "g2")
    assert main(
        ["build", "--transcripts", tpath, "--out", gpath, "--partitions", "2"]
    ) == 0
    capsys.readouterr()
    assert main(["run", "--graph", gpath, "--algorithm", "wcc"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] > 0
