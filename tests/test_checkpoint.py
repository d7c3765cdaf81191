"""Idempotent resume semantics (north rule: resumable from checkpoint with
per-partition lineage + metrics)."""

from __future__ import annotations

import pytest

from aide_spark.generator import local_corpus_df
from aide_spark.plans import pipeline
from aide_spark.plans.checkpoint import SnapshotStore, run_with_resume


@pytest.fixture()
def store(tmp_path):
    return SnapshotStore(str(tmp_path / "ckpt"))


def test_incremental_resume_matches_single_shot(spark, store):
    docs = local_corpus_df(spark, 36)
    half = docs.where("doc_id RLIKE '00000[0-9]$' OR doc_id RLIKE '0001[0-7]$'")

    r1 = run_with_resume(spark, half, store, batch_id="b1")
    assert r1["skipped_committed"] == 0

    r2 = run_with_resume(spark, docs, store, batch_id="b2")
    assert r2["skipped_committed"] == half.count()
    assert r2["docs_processed"] == 36 - half.count()

    resumed = {
        (r.doc_id, r.seq, r.kind, r.text, r.media_ref)
        for r in store.read(spark, "spans").collect()
    }
    single = {
        (r.doc_id, r.seq, r.kind, r.text, r.media_ref)
        for r in pipeline.run(docs)["spans_out"].collect()
    }
    assert resumed == single


def test_rerun_is_noop(spark, store):
    docs = local_corpus_df(spark, 12)
    run_with_resume(spark, docs, store, batch_id="b1")
    r = run_with_resume(spark, docs, store, batch_id="b2")
    assert r["docs_processed"] == 0 and r["spans"] == 0


def test_uncommitted_stage_is_invisible_and_reprocessed(spark, store):
    """Crash simulation: staged-but-uncommitted data must not be readable,
    and its docs must be reprocessed on the next run."""
    docs = local_corpus_df(spark, 12)
    out = pipeline.run(docs)
    store.stage(out["spans_out"], "spans", "crashed")  # no commit
    assert store.read(spark, "spans") is None

    r = run_with_resume(spark, docs, store, batch_id="b1")
    assert r["docs_processed"] == 12
    assert store.read(spark, "spans").count() == out["spans_out"].count()


def test_lineage_and_metrics_written(spark, store):
    docs = local_corpus_df(spark, 24)
    run_with_resume(spark, docs, store, batch_id="b1")
    lineage = store.read(spark, "lineage")
    assert lineage.count() == 24
    statuses = {r.status for r in lineage.collect()}
    assert statuses == {"committed", "quarantined"}
    metrics = store.read(spark, "metrics")
    rows = metrics.collect()
    assert sum(r.spans for r in rows) == store.read(spark, "spans").count()
    quarantine = store.read(spark, "quarantine")
    assert quarantine.count() == lineage.where("status = 'quarantined'").count()


def test_dlq_redrive_flags_critical_after_retries(spark, store):
    from aide_spark.plans.checkpoint import redrive_quarantined

    docs = local_corpus_df(spark, 16)  # includes deterministically-bad docs
    run_with_resume(spark, docs, store, batch_id="b1")
    n_quarantined = store.read(spark, "quarantine").count()
    assert n_quarantined > 0

    critical = None
    for _ in range(3):
        critical = redrive_quarantined(spark, docs, store, max_retries=3)
    crit_rows = critical.collect()
    # deterministically-invalid docs exhaust all 3 retries and get flagged
    assert {r.doc_id for r in crit_rows} == {
        r.doc_id for r in store.read(spark, "quarantine").select("doc_id").distinct().collect()
    }
    assert all(r.retries >= 3 for r in crit_rows)


def test_snapshot_time_travel(spark, store):
    docs = local_corpus_df(spark, 24)
    half = docs.where("doc_id RLIKE '00000[0-9]$'")
    run_with_resume(spark, half, store, batch_id="b1")
    run_with_resume(spark, docs, store, batch_id="b2")
    full = store.read(spark, "spans").count()
    at_b1 = store.read(spark, "spans", as_of="b1").count()
    assert 0 < at_b1 < full
    assert store.read(spark, "lineage", as_of="b1").count() == half.count()


def test_time_travel_with_mixed_batch_id_styles(spark, store, tmp_path):
    """as_of must order by commit TIME: 'stream-<n>' ids sort lexicographically
    after timestamp-prefixed ids, so string comparison would wrongly include a
    LATER timestamped batch in an as_of='stream-0' snapshot."""
    import pytest

    from aide_spark.plans.checkpoint import SnapshotStore

    s = SnapshotStore(str(tmp_path / "mixed"))
    docs = local_corpus_df(spark, 16)
    a = docs.where("doc_id RLIKE '0$'")
    b = docs.where("doc_id RLIKE '1$'")
    run_with_resume(spark, a, s, batch_id="stream-0")       # committed FIRST
    run_with_resume(spark, b, s, batch_id="20991231000000-zzz")  # later wall time
    at_stream0 = s.read(spark, "lineage", as_of="stream-0")
    assert {r.batch_id for r in at_stream0.select("batch_id").distinct().collect()} == {
        "stream-0"
    }
    with pytest.raises(KeyError):
        s.read(spark, "lineage", as_of="nonexistent")


def test_list_statements_orders_by_commit_time(spark, tmp_path):
    """S9 — newest-first must be COMMIT-TIME order: with mixed 'stream-<n>'
    and timestamp-prefixed batch ids, lexicographic batch_id ordering would
    put the OLDER 'stream-0' batch first (r2 advisory)."""
    from aide_spark.plans.checkpoint import SnapshotStore, list_statements

    s = SnapshotStore(str(tmp_path / "order"))
    docs = local_corpus_df(spark, 16)
    run_with_resume(spark, docs.where("doc_id RLIKE '0$'"), s, batch_id="stream-0")
    run_with_resume(
        spark, docs.where("doc_id RLIKE '1$'"), s, batch_id="20991231000000-zzz"
    )
    rows = list_statements(spark, s, limit=1000).select("batch_id").collect()
    batches = [r.batch_id for r in rows]
    # the later-committed timestamped batch leads; stream-0 rows follow
    assert batches[0] == "20991231000000-zzz"
    assert batches[-1] == "stream-0"
    first_stream = batches.index("stream-0")
    assert all(b == "stream-0" for b in batches[first_stream:])


def test_resume_run_triggers_no_extra_jobs(spark, store):
    """r3 VERDICT nit #1 — run_with_resume's only driver-side actions beyond
    the 4 stage writes must be the two TINY staged-parquet read-back
    aggregates: no pending.count(), no semi-join skipped count, no full
    spans-table read-back count (each of those re-executed the input plan).
    Verified by job-group audit: every job whose stage call-site is
    checkpoint.py must be a `collect` of the read-back aggregates — exactly
    two — and no `count at ...checkpoint.py` job may exist. (Raw job totals
    are NOT asserted: parquet reader/writer and broadcast-exchange sub-jobs
    are Spark internals that vary by plan.)"""
    docs = local_corpus_df(spark, 12)
    run_with_resume(spark, docs.where("doc_id RLIKE '[02468]$'"), store, batch_id="b1")

    sc = spark.sparkContext
    sc.setJobGroup("resume-audit", "run_with_resume job-count audit")
    try:
        r = run_with_resume(spark, docs, store, batch_id="b2")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)

    assert r["skipped_committed"] > 0  # the resume path actually exercised
    jsc = sc._jsc.sc().statusTracker()
    actions = []
    for j in sc.statusTracker().getJobIdsForGroup("resume-audit"):
        opt = jsc.getJobInfo(j)
        if not opt.isDefined():
            continue
        for sid in list(opt.get().stageIds()):
            so = jsc.getStageInfo(sid)
            if so.isDefined() and "checkpoint.py" in so.get().name():
                actions.append(so.get().name().split("\n")[0])
                break  # one call-site per job
    assert actions, "audit saw no checkpoint.py jobs at all"
    assert all(a.startswith("collect at") for a in actions), actions
    # AQE may split one action into several jobs — count distinct CALL-SITES
    assert len(set(actions)) == 2, sorted(set(actions))


def test_redrive_no_quarantine_returns_empty_frame(spark, store):
    """No quarantine table yet → an EMPTY frame with the declared schema,
    never None (callers chain .where(...) onto the result — r4 VERDICT #4)."""
    from aide_spark.plans.checkpoint import redrive_quarantined

    docs = local_corpus_df(spark, 4)
    out = redrive_quarantined(spark, docs, store)
    assert out.columns == ["doc_id", "error_code", "retries"]
    assert out.where("retries >= 0").count() == 0


def test_redrive_and_components_leave_no_new_caches(spark, store):
    """Cache-ownership hygiene (r4 VERDICT #4): a batch run, a DLQ redrive
    and a connected-components round-trip (caller honouring the unpersist
    contract) leave the persistent-RDD registry at its baseline — nothing
    accumulates in a long-lived driver loop."""
    from aide_spark.operators.dedup import connected_components
    from aide_spark.plans.checkpoint import redrive_quarantined

    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    docs = local_corpus_df(spark, 12)
    run_with_resume(spark, docs, store, batch_id="b1")
    critical = redrive_quarantined(spark, docs, store, max_retries=1)
    critical.count()
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "d1 long, d2 long")
    nodes = spark.createDataFrame([(n,) for n in range(1, 5)], "doc_id long")
    labels = connected_components(pairs, nodes)
    labels.count()
    labels.unpersist()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == baseline
