"""cli.py — the reference Main.java subcommand surface as thin glue."""

from __future__ import annotations

import glob
import json
import sys

import pytest

import cli


def _sink_lines(path: str) -> list[str]:
    """Lines of a run/training artifact — a REAL file (the distributed
    sink's single part file is promoted to the requested path; no
    .spark-text temp dir may be left behind)."""
    import os

    assert os.path.isfile(path)
    assert not os.path.exists(path + ".spark-text")
    return open(path).read().splitlines()


def _run(capsys, *argv):
    old = sys.argv
    sys.argv = ["cli.py", *argv]
    try:
        cli.main()
    finally:
        sys.argv = old
    return capsys.readouterr().out.strip().splitlines()


def test_cli_index_stats_query_roundtrip(spark, tmp_path, capsys):
    idx = str(tmp_path / "idx")
    out = _run(capsys, "index", "--sf", "0.001", "--out", idx,
               "--shards", "2", "--salts", "2")
    built = json.loads(out[-1])
    assert built["n_docs"] == 500 and built["merged"]

    out = _run(capsys, "stats", "--index", idx)
    st = json.loads(out[-1])
    assert st["n_docs"] == 500 and st["merged"]

    out = _run(capsys, "query", "--index", idx, "--query",
               "merge row batch", "--k", "5")
    assert len(out) == 5 and out[0].split("\t")[1] == "1"

    run = str(tmp_path / "run_out")
    _run(capsys, "query", "--index", idx, "--run-out", run, "--k", "5")
    lines = _sink_lines(run)
    # every query contributes up to k rows (some match fewer docs)
    assert 0 < len(lines) <= 250
    assert len({ln.split()[0] for ln in lines}) >= 45
    assert lines[0].split()[1] == "Q0" and lines[0].split()[5] == "spark-bm25"


def test_cli_ranklib_trainer_file_shape(spark, tmp_path, capsys):
    feat = str(tmp_path / "feat_out")
    out = _run(capsys, "ranklib_trainer", "--sf", "0.001", "--out", feat,
               "--k", "5")
    meta = json.loads(out[-1])
    assert 0 < meta["rows"] <= 250
    first = _sink_lines(feat)[0].split()
    # "<rel> qid:<id> 1:v .. 7:v # <doc>"
    assert first[0] in ("0", "1") and first[1].startswith("qid:")
    assert first[2].startswith("1:") and first[9] == "#"


def test_cli_ranklib_trainer_in_engine_training(spark, tmp_path, capsys):
    """--train learns weights in-process (coordinate ascent on MAP over
    the z-scored features) — the loop the reference outsources to the
    RankLib jar."""
    feat = str(tmp_path / "feat_train")
    out = _run(capsys, "ranklib_trainer", "--sf", "0.001", "--out", feat,
               "--k", "5", "--train", "--train-rounds", "1")
    meta = json.loads(out[-1])
    w = meta["trained_weights"]
    assert set(w) == set(meta["features"]) and len(w) == 7
    assert 0 < meta["train_map"] <= 1.0
    assert abs(sum(abs(v) for v in w.values()) - 1.0) < 1e-5


def test_cli_stream_ingest_merge_dedup(spark, tmp_path, capsys):
    """The ops subcommands end-to-end: index -> stream_ingest (new docs
    via Structured Streaming + auto merge) -> merge --strategy full ->
    dedup verdict."""
    idx = str(tmp_path / "ops_idx")
    _run(capsys, "index", "--sf", "0.001", "--out", idx,
         "--shards", "2", "--salts", "2")

    drop = str(tmp_path / "drop")
    spark.createDataFrame(
        [(900001, "merge row batch stream doc", "en", "s", 26)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(drop)
    out = _run(capsys, "stream_ingest", "--index", idx, "--input", drop,
               "--timeout", "120", "--salts", "2")
    st = json.loads(out[-1])
    assert st["ingested"] and st["n_docs"] == 501

    out = _run(capsys, "merge", "--index", idx, "--strategy", "full",
               "--salts", "2")
    mg = json.loads(out[-1])
    assert mg["last_merge"] == "full" and mg["encode_avgdl"] == mg["avgdl"]

    ded = str(tmp_path / "dedup_out")
    out = _run(capsys, "dedup", "--sf", "0.001", "--out", ded,
               "--method", "exact")
    dd = json.loads(out[-1])
    assert dd["n_docs"] == 500 and dd["n_dups"] >= 0


def test_cli_delete_compact_roundtrip(spark, tmp_path, capsys):
    """The deletes lifecycle as ops subcommands: index -> delete (a doc
    vanishes from query results while stats still count it) -> compact
    (stats re-baseline, tombstones cleared) -> delete --ids-parquet."""
    idx = str(tmp_path / "del_idx")
    _run(capsys, "index", "--sf", "0.001", "--out", idx,
         "--shards", "2", "--salts", "2")

    out = _run(capsys, "query", "--index", idx, "--query",
               "merge row batch", "--k", "3")
    top_doc = int(out[0].split("\t")[2])

    out = _run(capsys, "delete", "--index", idx, "--ids", str(top_doc))
    assert json.loads(out[-1])["n_tombstones"] == 1
    out = _run(capsys, "query", "--index", idx, "--query",
               "merge row batch", "--k", "3")
    assert top_doc not in {int(ln.split("\t")[2]) for ln in out}
    st = json.loads(_run(capsys, "stats", "--index", idx)[-1])
    assert st["n_docs"] == 500  # Lucene parity: stats count tombstoned docs

    out = _run(capsys, "compact", "--index", idx, "--salts", "2")
    c = json.loads(out[-1])
    assert c["n_tombstones"] == 0 and c["compacted_removed"] == 1
    assert c["n_docs"] == 499
    out = _run(capsys, "query", "--index", idx, "--query",
               "merge row batch", "--k", "3")
    assert top_doc not in {int(ln.split("\t")[2]) for ln in out}

    ids = str(tmp_path / "del_ids")
    spark.createDataFrame([(int(ln.split("\t")[2]),) for ln in out[:2]],
                          "doc_id long").write.parquet(ids)
    out = _run(capsys, "delete", "--index", idx, "--ids-parquet", ids)
    assert json.loads(out[-1])["n_tombstones"] == 2


def test_cli_verify_audit(spark, tmp_path, capsys):
    """`verify` audits a standing index against its source: clean after
    build, clean after a deliberate delete (tombstone-aware), non-zero
    exit on a corpus the index doesn't match."""
    idx = str(tmp_path / "ver_idx")
    _run(capsys, "index", "--sf", "0.001", "--out", idx,
         "--shards", "2", "--salts", "2")
    out = _run(capsys, "verify", "--index", idx, "--sf", "0.001")
    r = json.loads(out[-1])
    assert r["ok"] and r["matched"] == 500 and r["sha_mismatch"] == 0

    _run(capsys, "delete", "--index", idx, "--ids", "7")
    out = _run(capsys, "verify", "--index", idx, "--sf", "0.001",
               "--recount-dl")
    r = json.loads(out[-1])
    assert r["ok"] and r["tombstoned"] == 1 and r["dl_mismatch"] == 0

    with pytest.raises(SystemExit):
        _run(capsys, "verify", "--index", idx, "--gen", "50")


def test_cli_linker_out_of_scope(spark):
    with pytest.raises(SystemExit, match="out of scope"):
        cli.cmd_linker(None)


def test_promote_refuses_non_sink_directory(spark, tmp_path):
    """Round-7 CLI review: a mistyped --run-out pointing at an existing
    directory of unrelated files must be refused, not rmtree'd."""
    victim = tmp_path / "precious"
    victim.mkdir()
    (victim / "notes.txt").write_text("do not delete")
    tmp_sink = tmp_path / "sink.spark-text"
    tmp_sink.mkdir()
    (tmp_sink / "part-00000").write_text("line\n")
    (tmp_sink / "_SUCCESS").write_text("")
    with pytest.raises(SystemExit, match="refusing to overwrite"):
        cli._promote_single_text(spark, str(tmp_sink), str(victim))
    assert (victim / "notes.txt").exists()  # untouched
    # a STALE sink dir at the target is still cleared and replaced
    stale = tmp_path / "stale_out"
    stale.mkdir()
    (stale / "part-99").write_text("old\n")
    (stale / "_SUCCESS").write_text("")
    n = cli._promote_single_text(spark, str(tmp_sink), str(stale))
    assert n == 1 and stale.is_file()


def test_ranklib_empty_corpus_clean_error(spark, tmp_path, capsys):
    """Round-7 CLI review: an empty corpus must die with a clean CLI
    error, not a float(None) TypeError deep in bm25_scores."""
    empty = str(tmp_path / "empty.parquet")
    spark.createDataFrame(
        [], "doc_id long, text string").write.parquet(empty)
    run = str(tmp_path / "run_out")
    with pytest.raises(SystemExit, match="corpus is empty"):
        _run(capsys, "ranklib_query", "--corpus", empty,
             "--run-out", run)
