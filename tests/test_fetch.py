"""Resumable fetch operator vs the reference downloader's state machine."""

from __future__ import annotations

from pyspark.sql import functions as F

from landlensdb_spark.operators.fetch import fetch_batched, resume_filter


def _work(spark, n=12):
    return spark.range(n).select(
        F.col("id").cast("string").alias("mly_id"),
        F.concat(F.lit("https://img.example/"), F.col("id")).alias("image_url"),
    )


def test_fetch_status_machine(spark):
    def fake_fetch(url):
        i = int(url.rsplit("/", 1)[1])
        if i % 4 == 0:
            return 404, None          # permanent
        if i % 4 == 1:
            return 500, None          # always erroring -> failed_temporary
        return 200, f"img{i}".encode()

    out = fetch_batched(
        _work(spark), fetcher=fake_fetch, sleeper=lambda s: None
    ).collect()
    by_id = {r.mly_id: r for r in out}
    assert len(out) == 12
    for i in range(12):
        r = by_id[str(i)]
        if i % 4 == 0:
            assert r.status == "failed_permanent" and r.attempts == 1 and r.content is None
        elif i % 4 == 1:
            assert r.status == "failed_temporary" and r.attempts == 3
        else:
            assert r.status == "success" and bytes(r.content) == f"img{i}".encode()


def test_fetch_flaky_retry_succeeds(spark):
    calls: dict[str, int] = {}

    def flaky(url):
        calls[url] = calls.get(url, 0) + 1
        return (200, b"ok") if calls[url] >= 2 else (503, None)

    # single partition so the per-url call counter is one process
    work = _work(spark, 4).coalesce(1)
    out = fetch_batched(work, fetcher=flaky, sleeper=lambda s: None).collect()
    assert all(r.status == "success" and r.attempts == 2 for r in out)


def test_fetch_pacing_covers_retries(spark):
    """Every HTTP request pays the rate budget — retries included. With a
    1000s interval, requests 2..n of a URL's retry chain must each wait
    ~interval; the old per-URL pacing waited zero times here."""
    # sleeper + fetcher share one python-worker process; the fetcher reports
    # the worker-local big-sleep count back through the success payload
    calls: dict[str, int] = {}
    sleeps: list[float] = []

    def flaky(url):
        calls[url] = calls.get(url, 0) + 1
        if calls[url] >= 3:
            n_paced = sum(1 for s in sleeps if s > 100)
            return 200, str(n_paced).encode()
        return 500, None

    work = _work(spark, 1).coalesce(1)
    out = fetch_batched(
        work,
        fetcher=flaky,
        sleeper=sleeps.append,
        max_rps_per_task=0.001,  # 1000s interval: pace waits dwarf backoffs
    ).collect()
    assert out[0].status == "success" and out[0].attempts == 3
    # 3 requests -> the 2nd and 3rd must each pace (~1000s); backoff sleeps
    # (1s, 2s) are far below the threshold. Old per-URL pacing: 0.
    assert bytes(out[0].content) == b"2"


def test_resume_filter_semantics(spark):
    work = _work(spark, 8)

    def first_run(url):
        i = int(url.rsplit("/", 1)[1])
        if i < 3:
            return 200, b"x"
        if i == 3:
            return 404, None
        return 500, None  # 4..7 temporary

    status = fetch_batched(work, fetcher=first_run, sleeper=lambda s: None)
    pending = resume_filter(work, status)
    ids = sorted(int(r.mly_id) for r in pending.collect())
    # success (0-2) and permanent (3) excluded; temporary (4-7) retried
    assert ids == [4, 5, 6, 7]


def test_file_fetcher_real_transport(tmp_path):
    from landlensdb_spark.operators.fetch import file_fetcher

    p = tmp_path / "a.bin"
    p.write_bytes(b"hello")
    assert file_fetcher(f"file://{p}") == (200, b"hello")
    assert file_fetcher(str(p)) == (200, b"hello")  # bare path
    assert file_fetcher(f"file://{tmp_path}/missing.bin") == (404, None)


def test_fetch_batched_with_file_transport(spark, tmp_path):
    """The full downloader over the real filesystem transport: success
    carries bytes, missing files are permanent on attempt 1."""
    from pyspark.sql import functions as F

    from landlensdb_spark.operators.fetch import fetch_batched, file_fetcher

    (tmp_path / "f_0.bin").write_bytes(b"xx")
    (tmp_path / "f_2.bin").write_bytes(b"yyyy")
    work = spark.createDataFrame(
        [(i, f"file://{tmp_path}/f_{i}.bin") for i in range(3)],
        "key long, url string",
    )
    got = {
        r["key"]: (r["status"], r["attempts"], bytes(r["content"]) if r["content"] else None)
        for r in fetch_batched(
            work, fetcher=file_fetcher, id_col="key", url_col="url"
        ).collect()
    }
    assert got[0] == ("success", 1, b"xx")
    assert got[1] == ("failed_permanent", 1, None)
    assert got[2] == ("success", 1, b"yyyy")
