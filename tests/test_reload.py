"""Zero-downtime index publish: /admin/reload over a versioned index.

Journey: serve snapshot 0, publish snapshot 1 (a bigger rebuild) to
the same versioned table from the batch side, hot-swap via
/admin/reload, verify the serving view moved; time-travel back with
?version=0; a no-op reload reports reloaded=false.
"""

import json
import threading
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from google_like_search_engine_spark.corpus import generate_pages
from google_like_search_engine_spark.engine import SearchEngine
from google_like_search_engine_spark.server import make_server


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


@pytest.fixture(scope="module")
def reload_env(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vroot") / "vindex")
    small = generate_pages(spark, 60).where(F.col("lang") == "en")
    eng0 = SearchEngine(spark).build(small, run_pagerank=False)
    v0 = eng0.save_versioned(root)
    big = generate_pages(spark, 140).where(F.col("lang") == "en")
    eng1 = SearchEngine(spark).build(big, run_pagerank=False)
    v1 = eng1.save_versioned(root)
    n0, n1 = eng0.total_documents, eng1.total_documents
    eng1.unpersist()
    assert v1 > v0 and n1 > n0

    from google_like_search_engine_spark.sources.versioned import (
        VersionedTable,
    )

    snap0 = VersionedTable(spark, root).snapshot_dir(v0)
    serving = SearchEngine(spark).load_versioned(root, version=v0)
    serving.enable_serving()
    srv = make_server(
        serving, "127.0.0.1", 0, versioned_root=root, initial_snapshot=snap0
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, v0, v1, n0, n1
    srv.shutdown()
    eng0.unpersist()


def test_hot_swap_to_newest_snapshot(reload_env):
    base, v0, v1, n0, n1 = reload_env
    code, h = _get(f"{base}/health")
    assert code == 200 and h["documents"] == n0
    # the seeded initial snapshot makes a no-new-publish reload a true
    # no-op: the active serving engine must NOT be rebuilt/unpersisted
    code, r0 = _get(f"{base}/admin/reload?version={v0}")
    assert code == 200 and r0["reloaded"] is False and r0["documents"] == n0
    code, r = _get(f"{base}/admin/reload")
    assert code == 200 and r["reloaded"] and r["documents"] == n1
    code, h = _get(f"{base}/health")
    assert h["documents"] == n1
    # search serves the new snapshot (a bigger corpus scores more docs)
    code, s = _get(f"{base}/search?query=search+engine&k=100")
    assert code == 200 and s["results"]
    # same-snapshot reload is a no-op
    code, r2 = _get(f"{base}/admin/reload")
    assert code == 200 and r2["reloaded"] is False and r2["documents"] == n1
    # time-travel back to v0
    code, r3 = _get(f"{base}/admin/reload?version={v0}")
    assert code == 200 and r3["reloaded"] and r3["documents"] == n0
    code, h = _get(f"{base}/health")
    assert h["documents"] == n0


def test_reload_validation(reload_env):
    base = reload_env[0]
    try:
        urllib.request.urlopen(f"{base}/admin/reload?version=x", timeout=60)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_reload_404_without_versioned_root(spark):
    pages = generate_pages(spark, 40).where(F.col("lang") == "en")
    eng = SearchEngine(spark).build(pages, run_pagerank=False)
    srv = make_server(eng, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        urllib.request.urlopen(f"{base}/admin/reload", timeout=60)
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        srv.shutdown()
        eng.unpersist()
