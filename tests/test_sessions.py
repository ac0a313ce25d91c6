"""Sessionization boundary semantics: a gap of EXACTLY the threshold
starts a new session (matching session_window's half-open windows),
one microsecond less does not — asserted on constructed events against
both the Spark query and its DuckDB oracle."""

import datetime

import duckdb
import pytest


@pytest.fixture()
def sess_dir(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def at(us):
        return t0 + datetime.timedelta(microseconds=us)

    GAP = 1800 * 1_000_000
    rows = [
        # user 1: second event EXACTLY at the gap => two sessions
        (1, at(0), 1),
        (2, at(GAP), 1),
        # user 2: one microsecond inside the gap => one session
        (3, at(0), 2),
        (4, at(GAP - 1), 2),
        # user 3: clear split
        (5, at(0), 3),
        (6, at(3 * GAP), 3),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long"
    ).selectExpr(
        "event_id", "ts", "user_id",
        "'x' AS event_type", "0.0 AS value", "'{}' AS props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_exact_gap_starts_new_session(spark, sess_dir):
    from mcp_ocr_server_spark.queries import q_event_sessions

    out = q_event_sessions(spark, sess_dir).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2  # exact gap splits
    assert len(by_user[2]) == 1  # one microsecond less merges
    assert len(by_user[3]) == 2
    (s,) = by_user[2]
    assert s["n_events"] == 2 and s["duration_s"] == 1799.999999


def test_boundary_oracle_parity(spark, sess_dir):
    from mcp_ocr_server_spark.queries import O_EVENT_SESSIONS, q_event_sessions

    sdf = (
        q_event_sessions(spark, sess_dir)
        .toPandas()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sess_dir}/events.parquet/*.parquet')"
    )
    odf = (
        con.execute(O_EVENT_SESSIONS)
        .df()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)[list(sdf.columns)]
    )
    assert sdf.astype(str).equals(odf.astype(str))
