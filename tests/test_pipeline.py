"""End-to-end pipeline tests over the deterministic transcript fixture:
routed-row counts, aggregate equality, sort stability, text byte-identity,
and resume idempotence (north_rule correctness gates)."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from fluent_plugin_geoip_ray.pipelines.flagship import (
    canonical_routes,
    run_flagship,
    run_partitioned,
)
from fluent_plugin_geoip_ray.sources.transcripts import (
    ensure_transcripts,
    transcript_files,
)


@pytest.fixture(scope="module")
def sf_path():
    return ensure_transcripts(0.001)  # a DIRECTORY of part files


def total_rows(path):
    return pq.read_table(path).num_rows


def read_sink(out_dir, name):
    files = sorted(glob.glob(os.path.join(out_dir, name, "part=*", "*.parquet")))
    assert files, f"no sink files for {name}"
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_flagship_end_to_end(sf_path, tmp_path):
    out_dir = str(tmp_path / "out")
    stats = run_flagship(sf_path, out_dir=out_dir)
    total = total_rows(sf_path)

    raw = read_sink(out_dir, "raw")
    assert raw.num_rows == total

    enriched = read_sink(out_dir, "enriched")
    # gate: kept iff city (first record entry) resolved
    assert 0 < enriched.num_rows < total
    assert pc.all(pc.is_valid(enriched.column("city"))).as_py()
    assert pc.all(
        pc.match_substring_regex(enriched.column("tag"), "^enriched\\.")
    ).as_py()

    # stats rows agree with sink files
    srows = {
        (r["route"], r["kind"], r["key"]): r["n"] for r in stats.to_pylist()
    }
    assert srows[("raw", "rows", "")] == total
    assert srows[("enriched", "rows", "")] == enriched.num_rows

    # per-sink country aggregate equals a direct count over the sink
    direct = enriched.group_by("country_code").aggregate([([], "count_all")])
    for k, n in zip(
        direct.column("country_code").to_pylist(),
        direct.column("count_all").to_pylist(),
    ):
        assert srows[("enriched", "country_code", k)] == n


def test_text_byte_identity_under_stable_order(sf_path, tmp_path):
    """Per-turn text byte-identical under (conv_id, turn_idx) order
    (BASELINE.json input_hint invariant)."""
    out_dir = str(tmp_path / "out")
    run_flagship(sf_path, out_dir=out_dir)
    raw = read_sink(out_dir, "raw")
    raw = raw.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    src = pq.read_table(sf_path).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert raw.column("text").combine_chunks().equals(
        src.column("text").combine_chunks()
    )
    assert raw.column("ts").combine_chunks().equals(src.column("ts").combine_chunks())


def test_partitioned_run_and_resume(sf_path, tmp_path):
    out_dir = str(tmp_path / "out")
    r1 = run_partitioned(transcript_files(0.001), out_dir)
    assert r1["ran"] and not r1["skipped"]
    agg1 = r1["aggregates"].sort_by(
        [("route", "ascending"), ("kind", "ascending"), ("key", "ascending")]
    )
    sink1 = read_sink(out_dir, "enriched")

    # resume: nothing re-runs, outputs unchanged
    r2 = run_partitioned(transcript_files(0.001), out_dir)
    assert not r2["ran"] and r2["skipped"] == r1["ran"]
    agg2 = r2["aggregates"].sort_by(
        [("route", "ascending"), ("kind", "ascending"), ("key", "ascending")]
    )
    assert agg1.equals(agg2)
    sink2 = read_sink(out_dir, "enriched")
    assert sink1.num_rows == sink2.num_rows


def test_partition_crash_recovery(sf_path, tmp_path):
    """A partition without a manifest is garbage: cleaned and re-run."""
    out_dir = str(tmp_path / "out")
    r1 = run_partitioned(transcript_files(0.001), out_dir)
    # simulate crash: delete the manifest, leave sink files behind
    mpath = os.path.join(out_dir, "_manifests", "part-000000.json")
    os.remove(mpath)
    r2 = run_partitioned(transcript_files(0.001), out_dir)
    assert r2["ran"] == [0]  # only the crashed partition re-runs
    assert sorted(r2["ran"] + r2["skipped"]) == sorted(r1["ran"])
    sink = read_sink(out_dir, "raw")
    assert sink.num_rows == total_rows(sf_path)


def test_write_sorted_sink(sf_path, tmp_path):
    import ray.data as rd

    from fluent_plugin_geoip_ray.stages.route import write_sorted_sink

    out = str(tmp_path / "sorted")
    write_sorted_sink(rd.read_parquet(sf_path), out)
    t = pq.read_table(out)
    conv = t.column("conv_id").to_pylist()
    turn = t.column("turn_idx").to_pylist()
    assert list(zip(conv, turn)) == sorted(zip(conv, turn))


def test_fanout_write_idempotent_under_retry(sf_path, tmp_path):
    """A retried Ray task re-running the same batch must overwrite its own
    file (deterministic content-hashed name), never duplicate rows."""
    from fluent_plugin_geoip_ray.config import compile_record_spec
    from fluent_plugin_geoip_ray.pipelines.flagship import (
        FanoutWrite,
        canonical_record_spec,
        canonical_routes,
    )
    from fluent_plugin_geoip_ray.stages.enrich import GeoEnrich
    from fluent_plugin_geoip_ray.stages.parse import parse_transcripts

    batch = GeoEnrich(compile_record_spec(canonical_record_spec()))(
        parse_transcripts(pq.read_table(sf_path))
    )
    out = str(tmp_path / "retry")
    fw = FanoutWrite(canonical_routes(out))
    fw(batch)
    fw(batch)  # simulated retry of the same task
    files = glob.glob(os.path.join(out, "raw", "part=*", "*.parquet"))
    assert len(files) == 1
    assert pq.read_table(files[0]).num_rows == batch.num_rows


def test_fanout_write_no_cross_batch_collision(sf_path, tmp_path):
    """Two DIFFERENT batches sharing num_rows + boundary rows (hot conv, same
    first conv_id/turn_idx, same last ts) must get distinct file names --
    name hashes full key-column content, so no silent overwrite."""
    from fluent_plugin_geoip_ray.config import compile_record_spec
    from fluent_plugin_geoip_ray.pipelines.flagship import (
        FanoutWrite,
        canonical_record_spec,
        canonical_routes,
    )
    from fluent_plugin_geoip_ray.stages.enrich import GeoEnrich
    from fluent_plugin_geoip_ray.stages.parse import parse_transcripts

    batch = GeoEnrich(compile_record_spec(canonical_record_spec()))(
        parse_transcripts(pq.read_table(sf_path))
    )
    b1 = batch.slice(0, 4)
    # same shape and same first row; middle rows differ (turn_idx shifted)
    import pyarrow.compute as pc_

    shifted = pc_.add(batch.column("turn_idx").slice(0, 4), 1000)
    b2 = b1.set_column(b1.column_names.index("turn_idx"), "turn_idx", shifted)
    # restore first row so boundary keys match b1
    first = b1.column("turn_idx")[0].as_py()
    fixed = pa.array([first] + shifted.to_pylist()[1:], type=pa.int32())
    b2 = b2.set_column(b2.column_names.index("turn_idx"), "turn_idx",
                       fixed.cast(b1.column("turn_idx").type))
    out = str(tmp_path / "collide")
    fw = FanoutWrite(canonical_routes(out))
    fw(b1)
    fw(b2)
    files = glob.glob(os.path.join(out, "raw", "part=*", "*.parquet"))
    assert len(files) == 2
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == b1.num_rows + b2.num_rows


def test_multi_partition_resume():
    """3 partitions; one loses its manifest (crash) -> only that one re-runs."""
    import shutil
    import tempfile

    files = transcript_files(0.01)  # 4 part files at sf0.01
    assert len(files) >= 3
    out_dir = tempfile.mkdtemp(prefix="graft_multipart_")
    try:
        r1 = run_partitioned(files, out_dir, files_per_partition=2)
        n_parts = len(r1["ran"])
        assert n_parts >= 2
        os.remove(os.path.join(out_dir, "_manifests", "part-000001.json"))
        r2 = run_partitioned(files, out_dir, files_per_partition=2)
        assert r2["ran"] == [1]
        assert sorted(r2["skipped"] + r2["ran"]) == sorted(r1["ran"])
        total = sum(
            pq.read_table(f).num_rows
            for f in glob.glob(os.path.join(out_dir, "raw", "part=*", "*.parquet"))
        )
        assert total == sum(pq.read_table(f).num_rows for f in files)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_json_sink_format(sf_path, tmp_path):
    """Routes can sink ndjson lines (the Elasticsearch-shaped consumer)."""
    import json

    from fluent_plugin_geoip_ray.pipelines.flagship import run_flagship
    from fluent_plugin_geoip_ray.stages.route import RouteSpec

    out = str(tmp_path / "json_out")
    routes = [
        RouteSpec(name="j", match="transcripts.**", sink=os.path.join(out, "j"),
                  sink_format="json", skip_adding_null_record=True),
    ]
    run_flagship(sf_path, out_dir=out, routes=routes)
    files = glob.glob(os.path.join(out, "j", "part=*", "*.jsonl"))
    assert files
    row = json.loads(open(files[0]).readline())
    assert row["city"] and row["country_code"]


def test_read_aggregates_merge_on_read(sf_path, tmp_path):
    from fluent_plugin_geoip_ray.pipelines.flagship import read_aggregates, run_flagship

    out = str(tmp_path / "mor")
    stats = run_flagship(sf_path, out_dir=out)  # conv partials -> agg_partials
    merged = read_aggregates(os.path.join(out, "agg_partials"))
    conv = merged.filter(
        pc.and_(pc.equal(merged["kind"], "conv_id"), pc.equal(merged["route"], "raw"))
    )
    assert pc.sum(conv["n"]).as_py() == total_rows(sf_path)
    # country counts agree between the driver-merged stats and merge-on-read
    for r in stats.to_pylist():
        if r["kind"] == "country_code" and r["route"] == "enriched":
            m = merged.filter(
                pc.and_(
                    pc.and_(pc.equal(merged["kind"], "country_code"),
                            pc.equal(merged["route"], "enriched")),
                    pc.equal(merged["key"], r["key"]),
                )
            )
            assert pc.sum(m["n"]).as_py() == r["n"]


def test_incremental_ingest_appends_only_new_partition():
    """Continuous-ingest shape: after a completed run, newly-arrived input
    files become NEW partitions; re-running processes only those (existing
    partitions skipped via their manifests)."""
    import shutil
    import tempfile

    files = transcript_files(0.01)
    assert len(files) >= 3
    out_dir = tempfile.mkdtemp(prefix="graft_incr_")
    try:
        first = files[:-1]
        r1 = run_partitioned(first, out_dir, files_per_partition=1)
        assert len(r1["ran"]) == len(first)
        # a "new" file arrives
        r2 = run_partitioned(files, out_dir, files_per_partition=1)
        assert r2["ran"] == [len(files) - 1]
        assert sorted(r2["skipped"]) == list(range(len(first)))
        total = sum(
            pq.read_table(f).num_rows
            for f in glob.glob(os.path.join(out_dir, "raw", "part=*", "*.parquet"))
        )
        assert total == sum(pq.read_table(f).num_rows for f in files)
        # aggregates include the new partition
        agg = r2["aggregates"]
        rows_out = agg.filter(
            pc.and_(pc.equal(agg["route"], "raw"), pc.equal(agg["kind"], "rows"))
        )
        assert pc.sum(rows_out["n"]).as_py() == total
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_fanout_idempotent_under_real_ray_retry(sf_path, tmp_path):
    """Inject a genuine task failure AFTER sink files are written: Ray
    retries the task, the deterministic file names make the retry overwrite
    its own files, and total sink rows stay exact (no dupes, no loss)."""
    import ray
    import ray.data as rd

    from fluent_plugin_geoip_ray.pipelines.flagship import (
        FanoutWrite,
        build_enriched,
        canonical_routes,
    )

    out = str(tmp_path / "retrysink")
    marker = str(tmp_path / "crashed_once")
    routes = canonical_routes(out)

    def crashy(batch):
        fw = FanoutWrite(routes)
        result = fw(batch)  # files written BEFORE the crash
        if not os.path.exists(marker):
            open(marker, "w").write("x")
            os._exit(1)  # hard worker death -> Ray retries the task
        return result

    total = total_rows(sf_path)
    enriched = build_enriched(rd.read_parquet(sf_path))
    stats = enriched.map_batches(
        crashy, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=total,
    ).to_pandas()
    assert os.path.exists(marker)  # the failure really happened
    sink_rows = sum(
        pq.read_table(f).num_rows
        for f in glob.glob(os.path.join(out, "raw", "part=*", "*.parquet"))
    )
    assert sink_rows == total


def test_flagship_with_file_uri_sinks(sf_path, tmp_path):
    """Round-2 VERDICT item #8: sinks/aggregate side-outputs/manifests accept
    scheme:// URIs (fsio.py resolves via pyarrow.fs) -- the flagship run over
    a file:// out_dir produces byte-identical sink content to the plain-path
    run."""
    plain_dir = str(tmp_path / "plain")
    uri_dir = "file://" + str(tmp_path / "uri")
    s_plain = run_flagship(sf_path, out_dir=plain_dir)
    s_uri = run_flagship(sf_path, out_dir=uri_dir)

    def canon(stats):
        return stats.sort_by([("route", "ascending"), ("kind", "ascending"),
                              ("key", "ascending")])

    assert canon(s_plain).equals(canon(s_uri))
    a = read_sink(plain_dir, "enriched").sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    b = read_sink(str(tmp_path / "uri"), "enriched").sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert a.equals(b)


def test_partitioned_resume_with_file_uri(sf_path, tmp_path):
    """Partitioned run + resume over a file:// out_dir: manifests commit,
    resume skips everything, aggregates identical."""
    out_uri = "file://" + str(tmp_path / "out")
    r1 = run_partitioned(transcript_files(0.001), out_uri)
    assert r1["ran"] and not r1["skipped"]
    r2 = run_partitioned(transcript_files(0.001), out_uri)
    assert not r2["ran"] and r2["skipped"] == r1["ran"]
    agg1 = r1["aggregates"].sort_by(
        [("route", "ascending"), ("kind", "ascending"), ("key", "ascending")])
    agg2 = r2["aggregates"].sort_by(
        [("route", "ascending"), ("kind", "ascending"), ("key", "ascending")])
    assert agg1.equals(agg2)
    # manifests + aggregates landed under the resolved local dir
    base = str(tmp_path / "out")
    assert sorted(os.listdir(os.path.join(base, "_manifests")))
    assert os.path.exists(os.path.join(base, "aggregates.parquet"))


def test_hive_partitioned_write_and_pruned_read(tmp_path):
    """The generic 100 TB output layout: hive-partitioned parquet by a
    key column, read back with partition pruning (only the requested
    directory's files are touched) -- resumable, prunable sinks beyond
    the flagship's route-partitioned writer."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    t = pa.table({
        "lang": pa.array(["en", "de", "en", "fr", "de", "en"]),
        "doc_id": pa.array(range(6), pa.int64()),
        "n": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
    })
    out = str(tmp_path / "bylang")
    rd.from_arrow(t).write_parquet(out, partition_cols=["lang"])
    import os
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert dirs == ["lang=de", "lang=en", "lang=fr"]
    # pruned read: only the en partition directory
    en = rd.read_parquet(os.path.join(out, "lang=en")).to_pandas()
    assert sorted(en["doc_id"]) == [0, 2, 5]
    # full read restores the partition column from the path
    full = rd.read_parquet(out).to_pandas()
    assert len(full) == 6 and set(full["lang"]) == {"en", "de", "fr"}


def test_compact_sink_preserves_rows(sf_path, tmp_path):
    """Small-file compaction: per-partition batch files merge into few
    compact files with exact row preservation; re-running is idempotent."""
    import glob

    from fluent_plugin_geoip_ray.pipelines.flagship import (
        compact_sink,
        run_flagship,
    )

    out = str(tmp_path / "compact_out")
    run_flagship(sf_path, out_dir=out)
    raw = os.path.join(out, "raw")
    before_files = glob.glob(os.path.join(raw, "part=*", "batch-*.parquet"))
    assert before_files
    rows_before = sum(pq.read_table(f).num_rows for f in before_files)

    report = compact_sink(raw, target_rows_per_file=10_000_000)
    after = glob.glob(os.path.join(raw, "part=*", "*.parquet"))
    assert all(os.path.basename(f).startswith("compact-") for f in after)
    assert len(after) < len(before_files) or len(before_files) == 1
    assert sum(pq.read_table(f).num_rows for f in after) == rows_before
    assert sum(r["rows"] for r in report.values()) == rows_before

    # idempotent: a second run keeps rows and file count stable
    report2 = compact_sink(raw, target_rows_per_file=10_000_000)
    after2 = glob.glob(os.path.join(raw, "part=*", "*.parquet"))
    assert sum(pq.read_table(f).num_rows for f in after2) == rows_before
    assert len(after2) == len(after)


def _partition_rows(part):
    from fluent_plugin_geoip_ray.pipelines.flagship import partition_live_files

    lc, lb, _ = partition_live_files(part)
    return sum(pq.read_table(f).num_rows for f in lc + lb)


def test_compact_sink_crash_before_commit_is_invisible(sf_path, tmp_path):
    """A compaction that crashes BEFORE its manifest commit leaves
    uncommitted compact-g* files; the committed view must ignore them
    (no double rows) and a re-run must converge."""
    import shutil

    from fluent_plugin_geoip_ray.pipelines.flagship import (
        compact_sink,
        partition_live_files,
    )

    out = str(tmp_path / "crash1")
    run_flagship(sf_path, out_dir=out)
    raw = os.path.join(out, "raw")
    parts = sorted(glob.glob(os.path.join(raw, "part=*")))
    assert parts
    part = parts[0]
    rows = _partition_rows(part)

    # simulate the crash: a full-content compact-g file exists but no
    # manifest was ever committed
    batch = sorted(glob.glob(os.path.join(part, "batch-*.parquet")))
    merged = pa.concat_tables([pq.read_table(f) for f in batch])
    pq.write_table(merged, os.path.join(part, "compact-g0000-00000.parquet"))

    lc, lb, man = partition_live_files(part)
    assert man is None and lc == [] and len(lb) == len(batch)
    assert _partition_rows(part) == rows  # stray gen file invisible

    report = compact_sink(raw, target_rows_per_file=10_000_000)
    assert _partition_rows(part) == rows
    # the stray uncommitted file was garbage-collected post-commit
    names = [os.path.basename(f)
             for f in glob.glob(os.path.join(part, "compact-*.parquet"))]
    assert "compact-g0000-00000.parquet" not in names
    assert sum(r["rows"] for r in report.values()) >= rows


def test_compact_sink_crash_after_commit_excludes_absorbed(sf_path, tmp_path):
    """A crash AFTER the manifest commit but BEFORE cleanup leaves both the
    new compact files and the absorbed batch files on disk; readers and
    re-runs must count each row exactly once."""
    import json

    from fluent_plugin_geoip_ray.pipelines.flagship import (
        _COMPACT_MANIFEST,
        compact_sink,
        partition_live_files,
        read_sink_partition,
    )

    out = str(tmp_path / "crash2")
    run_flagship(sf_path, out_dir=out)
    raw = os.path.join(out, "raw")
    part = sorted(glob.glob(os.path.join(raw, "part=*")))[0]
    rows = _partition_rows(part)
    batch_before = sorted(glob.glob(os.path.join(part, "batch-*.parquet")))

    compact_sink(raw, target_rows_per_file=10_000_000)
    # resurrect the absorbed batch files (as if cleanup never ran)
    man = json.load(open(os.path.join(part, _COMPACT_MANIFEST)))
    lc, _, _ = partition_live_files(part)
    src = pq.read_table(lc)
    for name in man["absorbed"]:
        pq.write_table(src.slice(0, 1), os.path.join(part, name))

    # committed view excludes them: exactly-once rows
    assert _partition_rows(part) == rows
    assert read_sink_partition(part).count() == rows

    # re-run converges: skip (nothing new) but the duplicates stay excluded
    compact_sink(raw, target_rows_per_file=10_000_000)
    assert _partition_rows(part) == rows


def test_compact_sink_parallel_covers_all_partitions(sf_path, tmp_path):
    """Parallel mode compacts every partition concurrently (one Ray task
    each) with the same per-partition results as serial."""
    from fluent_plugin_geoip_ray.pipelines.flagship import compact_sink

    out_a = str(tmp_path / "par")
    out_b = str(tmp_path / "ser")
    run_flagship(sf_path, out_dir=out_a)
    run_flagship(sf_path, out_dir=out_b)

    rep_par = compact_sink(os.path.join(out_a, "raw"),
                           target_rows_per_file=10_000_000, parallel=True)
    rep_ser = compact_sink(os.path.join(out_b, "raw"),
                           target_rows_per_file=10_000_000, parallel=False)
    assert set(rep_par) == set(rep_ser) and len(rep_par) >= 1
    for k in rep_par:
        assert rep_par[k]["rows"] == rep_ser[k]["rows"]
        assert rep_par[k]["files_after"] == rep_ser[k]["files_after"]


def test_compact_sink_skip_path_gcs_leaked_files(sf_path, tmp_path):
    """A crash between the manifest commit and cleanup leaves absorbed
    batch files, superseded compact files, and stray tmps on disk; the
    next run takes the skip path (nothing to merge) and must still GC
    them (regression: skip path returned early, leaking forever)."""
    import json

    from fluent_plugin_geoip_ray.pipelines.flagship import (
        _COMPACT_MANIFEST,
        compact_sink,
        partition_live_files,
    )

    out = str(tmp_path / "crash3")
    run_flagship(sf_path, out_dir=out)
    raw = os.path.join(out, "raw")
    part = sorted(glob.glob(os.path.join(raw, "part=*")))[0]
    rows = _partition_rows(part)

    compact_sink(raw, target_rows_per_file=10_000_000)
    # simulate crash-before-cleanup debris: absorbed batch files back on
    # disk, a compact file from a superseded generation, a stray tmp
    man = json.load(open(os.path.join(part, _COMPACT_MANIFEST)))
    lc, _, _ = partition_live_files(part)
    src = pq.read_table(lc)
    for name in man["absorbed"]:
        pq.write_table(src.slice(0, 1), os.path.join(part, name))
    stale = os.path.join(part, "compact-g0099-00000.parquet")
    pq.write_table(src.slice(0, 1), stale)
    tmp = os.path.join(part, "_compact-g0099-00001.tmp")
    open(tmp, "w").close()

    report = compact_sink(raw, target_rows_per_file=10_000_000)
    base = os.path.basename(part)
    assert report[base]["skipped"] is True
    assert report[base]["gc_removed"] == len(man["absorbed"]) + 2
    assert not glob.glob(os.path.join(part, "batch-*.parquet"))
    assert not os.path.exists(stale) and not os.path.exists(tmp)
    assert _partition_rows(part) == rows

    # and once clean, re-running GCs nothing
    report2 = compact_sink(raw, target_rows_per_file=10_000_000)
    assert report2[base]["gc_removed"] == 0
