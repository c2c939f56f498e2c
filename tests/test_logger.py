"""C22 buffered async logger (reference genesis/src/logger.rs:14-69):
size-triggered flush, background interval flush, close-flush, and the
crawl engine's per-round summary wiring."""

import re
import time

from vyntr_spark.logger import LOG_NAMES, AsyncLogger, log_file_name

LINE_RE = re.compile(r"^\[\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\] .+$")


def test_seeded_file_name_is_stable():
    assert log_file_name(seed=42) == log_file_name(seed=42)
    name = log_file_name(seed=7)
    assert name.startswith("crawler-") and name.endswith(".log")
    assert name[len("crawler-"):-len(".log")] in LOG_NAMES


def test_size_triggered_flush(tmp_path):
    log = AsyncLogger(str(tmp_path), buffer_size=3, flush_interval=None,
                      seed=1)
    log.add_entry("one")
    log.add_entry("two")
    assert log.pending() == 2  # below buffer_size: nothing on disk yet
    assert open(log.path).read() == ""
    log.add_entry("three")  # hits buffer_size -> flush (logger.rs:55-58)
    assert log.pending() == 0
    lines = open(log.path).read().splitlines()
    assert [ln.split("] ", 1)[1] for ln in lines] == ["one", "two", "three"]
    assert all(LINE_RE.match(ln) for ln in lines)
    log.close()


def test_interval_flush_and_close(tmp_path):
    log = AsyncLogger(str(tmp_path), buffer_size=1000, flush_interval=0.2,
                      seed=2)
    log.add_entry("ticked")
    deadline = time.time() + 3.0
    while log.pending() and time.time() < deadline:
        time.sleep(0.05)
    assert log.pending() == 0  # the 5s-tick analog flushed it
    log.add_entry("closing")
    log.close()  # close flushes the remainder
    body = open(log.path).read()
    assert "ticked" in body and "closing" in body


def test_add_entry_after_close_raises(tmp_path):
    # entries after close() can never reach the file — they must fail
    # loudly, not buffer silently (regression)
    import pytest

    log = AsyncLogger(str(tmp_path), buffer_size=10, flush_interval=None,
                      seed=3)
    log.add_entry("before")
    log.close()
    with pytest.raises(ValueError):
        log.add_entry("after")


def test_crawl_engine_logs_round_summaries(spark, tmp_path):
    from vyntr_spark.crawl import CrawlEngine
    from vyntr_spark.synth import default_seeds, generate_pages
    from vyntr_spark.tables import PAGES, SnapshotStore

    rows = generate_pages(40, 4, seed=5)
    pdf = spark.createDataFrame(rows, schema=PAGES)
    with AsyncLogger(str(tmp_path / "logs"), buffer_size=1,
                     flush_interval=None, seed=5) as log:
        eng = CrawlEngine(spark, SnapshotStore(spark, str(tmp_path / "wh")),
                          pdf, max_pages=1000, seed=5, logger=log)
        eng.init_from_seeds(default_seeds(40, 4, k=2))
        infos = eng.run(max_rounds=2)
        body = open(log.path).read()
    lines = [ln for ln in body.splitlines() if "round " in ln]
    assert len(lines) == len(infos)
    for info, ln in zip(infos, lines):
        assert f"round {info.round}: selected={info.selected} " in ln
        assert f"new_urls={info.new_urls}" in ln
