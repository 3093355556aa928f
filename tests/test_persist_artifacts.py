"""tools/persist_artifacts.py — the reset-survival sync.

Round-10 postmortem: a container reset wiped ``.data/`` (four rounds of
timed-label corpus + every checkpoint). These tests pin the save/restore
contract that makes the loss unrepeatable: save mirrors the small
irreplaceable files into the git-tracked ``artifacts/``; restore
rebuilds ``.data/`` on a fresh box and never clobbers newer work.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "persist_artifacts", REPO / "tools" / "persist_artifacts.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["persist_artifacts"] = mod
    spec.loader.exec_module(mod)
    mod.DATA = tmp_path / ".data"
    mod.ART = tmp_path / "artifacts"
    return mod


def test_save_mirrors_corpus_and_checkpoints(tmp_path):
    m = _load(tmp_path)
    (m.DATA / "gen_r10_a").mkdir(parents=True)
    (m.DATA / "gen_r10_a" / "workload.csv").write_text("sql,runtime\n")
    (m.DATA / "est_best").mkdir(parents=True)
    (m.DATA / "est_best" / "model_gru.json").write_text("{}")
    (m.DATA / "est_best" / "choice.json").write_text("{}")
    # large regenerables must NOT be mirrored
    (m.DATA / "est_r10").mkdir(parents=True)
    (m.DATA / "est_r10" / "enc_cache.pkl").write_text("x" * 1024)
    (m.DATA / "sf1").mkdir(parents=True)
    (m.DATA / "sf1" / "lineitem.parquet").write_text("parquet")

    n = m.save()
    assert n == 3
    assert (m.ART / "gen_r10_a" / "workload.csv").exists()
    assert (m.ART / "est_best" / "model_gru.json").exists()
    assert not (m.ART / "est_r10" / "enc_cache.pkl").exists()
    assert not (m.ART / "sf1").exists()
    # idempotent: unchanged files are not re-copied
    assert m.save() == 0


def test_restore_rebuilds_fresh_box_without_clobbering(tmp_path):
    m = _load(tmp_path)
    (m.ART / "gen_r10_a").mkdir(parents=True)
    (m.ART / "gen_r10_a" / "workload.csv").write_text("old-corpus")
    (m.ART / "est_best").mkdir(parents=True)
    (m.ART / "est_best" / "choice.json").write_text("old-choice")

    assert m.restore() == 2
    assert (m.DATA / "gen_r10_a" / "workload.csv").read_text() == "old-corpus"

    # a fresher working file survives a second restore untouched
    (m.DATA / "gen_r10_a" / "workload.csv").write_text("newer-rows")
    assert m.restore() == 0
    assert (m.DATA / "gen_r10_a" / "workload.csv").read_text() == "newer-rows"


def test_save_then_restore_roundtrip_after_reset(tmp_path):
    m = _load(tmp_path)
    (m.DATA / "gen_sf10_r10").mkdir(parents=True)
    (m.DATA / "gen_sf10_r10" / "workload.csv").write_text("a,1\n")
    (m.DATA / "gen_sf10_r10" / "schema.json").write_text("{}")
    m.save()

    # simulate the reset
    import shutil

    shutil.rmtree(m.DATA)
    assert m.restore() == 2
    assert (m.DATA / "gen_sf10_r10" / "workload.csv").read_text() == "a,1\n"

def test_save_never_regresses_newer_artifact(tmp_path):
    """Round-10 advice: a box with stale .data (git pull from elsewhere,
    interrupted run) must not overwrite a newer git-tracked mirror even
    when sizes differ."""
    import os

    m = _load(tmp_path)
    (m.DATA / "gen_r10_a").mkdir(parents=True)
    src = m.DATA / "gen_r10_a" / "workload.csv"
    src.write_text("stale-short")
    dst = m.ART / "gen_r10_a" / "workload.csv"
    dst.parent.mkdir(parents=True)
    dst.write_text("fresh-artifact-with-more-rows")
    # make the artifact strictly newer than the working file
    os.utime(src, (1_000_000, 1_000_000))
    os.utime(dst, (2_000_000, 2_000_000))

    assert m.save() == 0
    assert dst.read_text() == "fresh-artifact-with-more-rows"


def test_restore_force_replaces_stale_working_file(tmp_path):
    """Round-10 advice: an older/truncated .data file must not silently
    shadow the known-good artifact; --force replaces it."""
    import os

    m = _load(tmp_path)
    dst = m.DATA / "est_best" / "choice.json"
    dst.parent.mkdir(parents=True)
    dst.write_text("truncat")
    src = m.ART / "est_best" / "choice.json"
    src.parent.mkdir(parents=True)
    src.write_text("good-choice")
    os.utime(dst, (1_000_000, 1_000_000))
    os.utime(src, (2_000_000, 2_000_000))

    # default: skipped (surfaced to the operator), file untouched
    assert m.restore() == 0
    assert dst.read_text() == "truncat"
    # force: artifact wins
    assert m.restore(force=True) == 1
    assert dst.read_text() == "good-choice"


def test_restore_force_never_clobbers_newer_working_file(tmp_path, capsys):
    """Round-11 advice: the skip message implies --force replaces STALE
    files; unsaved post-save work (a .data file strictly newer than the
    artifact) must survive even under force, loudly."""
    import os

    m = _load(tmp_path)
    dst = m.DATA / "gen_r11" / "workload.csv"
    dst.parent.mkdir(parents=True)
    dst.write_text("fresh-unsaved-labels")
    src = m.ART / "gen_r11" / "workload.csv"
    src.parent.mkdir(parents=True)
    src.write_text("older-banked-copy")
    os.utime(src, (1_000_000, 1_000_000))
    os.utime(dst, (2_000_000, 2_000_000))

    assert m.restore(force=True) == 0
    assert dst.read_text() == "fresh-unsaved-labels"
    assert "NOT replacing" in capsys.readouterr().out


def test_save_warns_on_same_size_content_divergence(tmp_path, capsys):
    """Round-11 advice: artifact mtimes are reset by any git clone/pull,
    so a same-size different-content .data file must be surfaced, not
    dropped silently (the old check compared sizes only)."""
    import os

    m = _load(tmp_path)
    src = m.DATA / "gen_r11" / "workload.csv"
    src.parent.mkdir(parents=True)
    src.write_text("rows-AAAA")
    dst = m.ART / "gen_r11" / "workload.csv"
    dst.parent.mkdir(parents=True)
    dst.write_text("rows-BBBB")  # same size, different content
    os.utime(src, (1_000_000, 1_000_000))
    os.utime(dst, (2_000_000, 2_000_000))

    assert m.save() == 0
    assert dst.read_text() == "rows-BBBB"
    assert "content DIFFERS" in capsys.readouterr().out
