"""Windowed aggregates, upsert, sampling (§2.9 streaming-shaped ops)."""

import datetime as dt

import pyarrow as pa
import ray.data as rd

from shacl_validator_ray.functions import ns
from shacl_validator_ray.stages import windows


def _events():
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # user 1: two sessions (gap 45 min between event 2 and 3)
    for i, mins in enumerate([0, 10, 55, 60]):
        rows.append({"event_id": i, "ts": base + dt.timedelta(minutes=mins),
                     "user_id": 1, "event_type": "click", "value": 1.0})
    # user 2: one session crossing the hour boundary
    for i, mins in enumerate([50, 70]):
        rows.append({"event_id": 10 + i, "ts": base + dt.timedelta(minutes=mins),
                     "user_id": 2, "event_type": "view", "value": 2.0})
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_tumbling_window():
    out = windows.tumbling_window(_events()).to_pandas()
    d = {(r["event_type"], r["window_start"]): (r["n"], r["total"])
         for r in out.to_dict("records")}
    h0 = int(dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp())
    assert d[("click", h0)] == (3, 3.0)       # minutes 0,10,55
    assert d[("click", h0 + 3600)] == (1, 1.0)  # minute 60
    assert d[("view", h0)] == (1, 2.0)
    assert d[("view", h0 + 3600)] == (1, 2.0)


def test_sliding_window_counts():
    out = windows.sliding_window(_events(), size_s=3600, slide_s=1800).to_pandas()
    # each event belongs to exactly 2 overlapping windows (size/slide = 2)
    assert out["n"].sum() == 2 * 6


def test_session_windows_gap_split():
    out = windows.session_windows(_events(), gap_s=1800).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("sid")
    assert list(u1["sid"]) == [1, 2]
    assert list(u1["n_events"]) == [2, 2]
    u2 = out[out["user_id"] == 2]
    assert len(u2) == 1 and u2.iloc[0]["n_events"] == 2


def test_upsert_latest_keeps_last_row():
    out = windows.upsert_latest(_events()).to_pandas()
    assert len(out) == 2
    assert set(out["event_id"]) == {3, 11}


def test_systematic_sample_deterministic():
    ds = rd.range(100)
    out = windows.systematic_sample(ds, "id", modulus=10, keep=7).to_pandas()
    assert sorted(out["id"]) == list(range(7, 100, 10))


def test_compact_iri_m10():
    assert ns.compact_iri(ns.DCAT + "Dataset") == "dcat:Dataset"
    assert ns.compact_iri(ns.DCT + "title") == "dct:title"
    assert ns.compact_iri("http://unknown.org/path/leaf") == "leaf"
    assert ns.compact_iri("http://unknown.org/x#frag") == "frag"


def test_lang_id_multilingual():
    from shacl_validator_ray.functions import textfns as tf

    assert tf.lang_id("the cat and the dog is with me") == "en"
    assert tf.lang_id("el perro es de la casa con su amigo") == "es"
    assert tf.lang_id("le chat est avec la maison pour moi") == "fr"
    assert tf.lang_id("der hund ist mit die katze und das haus") == "de"
    assert tf.lang_id("xyzzy plugh") == "und"


def test_sliding_window_epoch_edge():
    """Events near epoch 0: windows with negative start are not emitted."""
    import pyarrow as pa
    import ray.data as rd

    import datetime as dt

    rows = [{"event_id": 1, "ts": dt.datetime(1970, 1, 1, 0, 10),
             "user_id": 1, "event_type": "x", "value": 1.0}]
    out = windows.sliding_window(rd.from_arrow(pa.Table.from_pylist(rows)),
                                 size_s=3600, slide_s=1800).to_pandas()
    assert (out["window_start"] >= 0).all()
    assert len(out) == 1  # only window [0, 3600) exists; [-1800, 1800) dropped


def test_rolling_fingerprint_deterministic():
    from shacl_validator_ray.functions import textfns as tf

    a = tf.rolling_fingerprint("Hello World")
    assert a == tf.rolling_fingerprint("  hello world  ")  # normalized
    assert a != tf.rolling_fingerprint("hello worlds")


def test_asof_join_latest_view_per_click():
    """Each click joins the most recent view at-or-before it per user;
    exact-timestamp ties break to the max right event_id; clicks with no
    prior view drop (inner)."""
    base = dt.datetime(2024, 1, 1)
    rows = []

    def ev(eid, mins, uid, typ):
        rows.append({"event_id": eid, "ts": base + dt.timedelta(minutes=mins),
                     "user_id": uid, "event_type": typ})

    ev(1, 0, 1, "view"); ev(2, 5, 1, "view"); ev(3, 10, 1, "click")
    ev(4, 20, 1, "click")          # both clicks see view 2
    ev(5, 0, 2, "click")           # no prior view → dropped
    ev(6, 30, 2, "view"); ev(7, 30, 2, "view")  # tie: same ts
    ev(8, 30, 2, "click")          # exact-match tie → view 7 (max id)
    out = windows.asof_join(rd.from_arrow(pa.Table.from_pylist(rows)))
    got = {r["event_id"]: (r["right_event_id"], r["lag_us"])
           for r in out.to_pandas().to_dict("records")}
    assert got == {3: (2, 5 * 60 * 1_000_000),
                   4: (2, 15 * 60 * 1_000_000),
                   8: (7, 0)}, got


def test_interval_join_points_to_containing_interval():
    """Points join the per-key interval containing their ts; points
    outside every interval drop; keys without intervals drop."""
    pts = rd.from_arrow(pa.Table.from_pylist([
        {"event_id": 1, "user_id": 1, "ts_s": 5},
        {"event_id": 2, "user_id": 1, "ts_s": 25},   # gap → drops
        {"event_id": 3, "user_id": 1, "ts_s": 35},
        {"event_id": 4, "user_id": 2, "ts_s": 5},    # no intervals → drops
    ]))
    ivs = rd.from_arrow(pa.Table.from_pylist([
        {"user_id": 1, "sid": 1, "session_start": 0, "session_end": 10},
        {"user_id": 1, "sid": 2, "session_start": 30, "session_end": 40},
    ]))
    out = windows.interval_join(pts, ivs)
    got = {r["event_id"]: r["sid"] for r in out.to_pandas().to_dict("records")}
    assert got == {1: 1, 3: 2}, got


def test_new_operators_accept_empty_inputs():
    """asof/interval joins, sequence packing and contamination must all
    return empty results (not crash) on empty datasets."""
    from shacl_validator_ray.stages import text as text_mod

    empty_ev = rd.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string())}))
    assert windows.asof_join(empty_ev).count() == 0
    empty_docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert text_mod.sequence_pack(empty_docs).count() == 0
    assert text_mod.contamination(empty_docs).count() == 0
    pts = rd.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts_s": pa.array([], pa.int64())}))
    ivs = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()), "sid": pa.array([], pa.int64()),
        "session_start": pa.array([], pa.int64()),
        "session_end": pa.array([], pa.int64())}))
    assert windows.interval_join(pts, ivs).count() == 0


def test_funnel_strict_after_semantics():
    """Steps only count with an event STRICTLY after the previous
    step's earliest qualifying time; out-of-order and same-timestamp
    events must not advance the funnel."""
    from shacl_validator_ray.stages import windows

    def us(s):
        return s * 1_000_000

    rows = [
        # user 1: full ordered funnel
        (1, "view", us(10)), (1, "click", us(20)), (1, "purchase", us(30)),
        # user 2: click BEFORE view only -> reaches step 1 only
        (2, "click", us(5)), (2, "view", us(10)),
        # user 3: click at the SAME ts as view -> strict "after" fails
        (3, "view", us(10)), (3, "click", us(10)),
        # user 4: no view at all -> contributes nothing
        (4, "purchase", us(1)),
    ]
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us"))}))
    out = windows.funnel_counts(ev).to_pandas()
    assert out.iloc[0].tolist() == [3, 1, 1]


def test_zscore_outliers_small_groups_and_constants_excluded():
    from shacl_validator_ray.stages import windows

    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1, 1, 2, 3, 3], pa.int64()),
        "event_id": pa.array(list(range(9)), pa.int64()),
        # user 1: one wild outlier; user 2: singleton; user 3: constant
        "value": pa.array([1.0, 1.0, 1.0, 1.0, 1.0, 100.0,
                           5.0, 7.0, 7.0], pa.float64())}))
    out = windows.zscore_outliers(ev, threshold=2.0).to_pandas()
    assert out["event_id"].tolist() == [5]
    assert (out["z"] > 2.0).all()


def test_rank_quartiles_ntile_rule_small_n(tmp_path):
    """ntile over n=6, tiles=4: SQL gives sizes 2,2,1,1 — the first
    n % tiles tiles take the extra row."""
    import duckdb
    import pyarrow.parquet as pq

    t = pa.table({"c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                  "c_acctbal": pa.array([10.0, 20.0, 30.0, 40.0,
                                         50.0, 60.0], pa.float64())})
    pq.write_table(t, str(tmp_path / "customer.parquet"))
    from shacl_validator_ray.pipelines import relational

    out = relational.rank_quartiles(str(tmp_path)).to_pandas() \
        .sort_values("rnk").reset_index(drop=True)
    assert out["rnk"].tolist() == [1, 2, 3, 4, 5, 6]
    assert out["quartile"].tolist() == [1, 1, 2, 2, 3, 4]


def test_retention_cohorts_planted():
    """Two users in different weekly cohorts; retention cells count
    distinct members per (cohort, offset)."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from shacl_validator_ray.stages import windows

    def ts(day):
        return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)

    rows = [
        (1, ts(0)), (1, ts(1)),        # u1 cohort week W, active W only
        (2, ts(0)), (2, ts(8)),        # u2 cohort W, active W and W+1
        (3, ts(8)), (3, ts(16)),       # u3 cohort W+1, active W+1, W+2
    ]
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))}))
    got = (windows.retention_cohorts(ev).to_pandas()
           .sort_values(["cohort_period", "period_offset"])
           .reset_index(drop=True))
    cells = {(r.cohort_period, r.period_offset): r.n_users
             for r in got.itertuples()}
    w = min(c for c, _ in cells)
    assert cells == {(w, 0): 2, (w, 1): 1, (w + 1, 0): 1, (w + 1, 1): 1}


def test_hash_split_deterministic_and_validated():
    import collections

    import pyarrow as pa
    import pytest
    import ray.data as rd

    from shacl_validator_ray.stages import windows as W

    docs = rd.from_arrow(pa.table({"doc_id": pa.array(range(5000), pa.int64())}))
    a = W.hash_split(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = W.hash_split(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a == b).all().all()
    c = collections.Counter(a["split"])
    assert abs(c["train"] / 5000 - 0.9) < 0.02
    assert abs(c["val"] / 5000 - 0.05) < 0.01
    # a different salt reshuffles assignments
    d = W.hash_split(docs, salt="other").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert (a["split"] != d["split"]).any()
    with pytest.raises(ValueError, match="sum to 1"):
        W.hash_split(docs, fractions={"train": 0.5, "test": 0.4})
