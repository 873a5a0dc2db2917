"""The local oracle gate must be at least as strict as the driver's hash.

Round 3 shipped its one red row (events_type_skew_report) because
tools/oracle_check.py rounded floats to 9 digits while the driver hashes
exact values -- a last-ulp cross-engine difference passed locally and
failed in CORRECTNESS_r03. These tests pin the tightened canonicalization
(VERDICT r3 item 3): values that differ in the last ulp must canonicalize
differently.
"""

import importlib.util
import math
import pathlib


def _load_oracle_check():
    path = pathlib.Path(__file__).resolve().parents[1] / "tools" / "oracle_check.py"
    spec = importlib.util.spec_from_file_location("oracle_check", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_canon_cell_detects_last_ulp_float_drift():
    oc = _load_oracle_check()
    # The exact r3 failure shape: two doubles equal to 9 decimal digits but
    # differing in the last ulp (round-half-up over binary doubles can land
    # either side across engines).
    a = 1.37
    b = math.nextafter(a, 2.0)
    assert round(a, 9) == round(b, 9)  # the old 9-digit canon collapsed these
    assert oc.canon_cell(a) != oc.canon_cell(b)  # the new one must not


def test_canon_cell_decimal_scale_insensitive_value_sensitive():
    import decimal

    oc = _load_oracle_check()
    # Same exact value at different scales (Spark DECIMAL(19,2) vs DuckDB
    # minimal scale) must match; a real value difference must not.
    assert oc.canon_cell(decimal.Decimal("2.50")) == oc.canon_cell(decimal.Decimal("2.5"))
    assert oc.canon_cell(decimal.Decimal("2.50")) != oc.canon_cell(decimal.Decimal("2.51"))


def test_canon_cell_basics_unchanged():
    oc = _load_oracle_check()
    assert oc.canon_cell(None) == "NULL"
    assert oc.canon_cell(float("nan")) == "NaN"
    assert oc.canon_cell(True) == "True"
    assert oc.canon_cell(b"\x01\xff") == "01ff"
    assert oc.canon_cell([1.5, None]) == "[1.5,NULL]"


def test_bench_json_contract(monkeypatch, capsys, tmp_path):
    """bench.py must emit ONE parseable JSON line with the driver's
    expected keys, under the 2000-char stdout-tail budget. Runs a
    2-query HEADLINE at smoke scale so the contract (not throughput)
    is what's tested."""
    import json

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setattr(bench, "HEADLINE", ["pricing_summary", "order_revenue"])
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_SF1_DIR", "/nonexistent")  # skip 10x pass
    # the 100x decade block reads its OWN env var -- without this, the
    # contract test silently runs the full SF10_QUERIES set whenever the
    # .bench_sf10 fixture exists on disk (measured: a 17-minute test)
    monkeypatch.setenv("SPARK_GRAFT_SF10_DIR", "/nonexistent")
    monkeypatch.setenv("SPARK_GRAFT_DETAIL", str(tmp_path / "detail.json"))
    assert bench.main() == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= 1900
    out = json.loads(line)
    assert out["metric"] == "headline_queries_total_sec"
    assert out["unit"] == "sec"
    assert out["sf"] == 0.001
    assert set(out["queries"]) == {"pricing_summary", "order_revenue"}
    assert out["value"] > 0


def test_dashboard_export_renders_all_tabs(spark, sf_dir):
    """The BI rendering edge (VERDICT r4 missing item 2): every tab's frame
    computes in Spark and the standalone HTML carries 7 sections, stat
    tiles, SVG charts, a table view per chart, and the tooltip layer."""
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "tools" / "dashboard_export.py"
    spec = importlib.util.spec_from_file_location("dashboard_export", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    frames = mod.build_frames(spark, sf_dir)
    doc = mod.render_html(frames, sf_dir)
    assert doc.count("<section>") == 7
    assert doc.count("Table view") == 6  # churn tab is a pure KPI row
    assert doc.count('class="tile"') >= 11
    assert "<svg" in doc and "crosshair" in doc and "bar-hit" in doc
    # text tokens carry labels, marks carry the series color (no colored text)
    assert 'fill: var(--series-1)' in doc and "svg text { fill: var(--ink-1)" in doc


def test_dashboard_serve_interactive_roundtrip(spark, sf_dir):
    """The INTERACTIVE BI surface (VERDICT r5 missing item 2): the server
    renders over a live SparkSession, serves HTTP 200 with all 7 tabs,
    exposes a refresh control that recomputes frames in Spark, and
    answers /healthz without touching Spark."""
    import importlib.util
    import pathlib
    import threading
    import urllib.request
    from http.server import HTTPServer

    tools = pathlib.Path(__file__).resolve().parents[1] / "tools"
    for name in ("dashboard_export", "dashboard_serve"):
        spec = importlib.util.spec_from_file_location(name, tools / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        import sys as _sys

        _sys.modules[name] = mod  # serve imports export by module name
        spec.loader.exec_module(mod)
    serve = _sys.modules["dashboard_serve"]

    srv = serve.DashboardServer(spark, sf_dir)
    first = srv.document()
    assert first.count("<section>") == 7 and "Refresh data" in first
    assert srv.document() is first  # cached: no recompute on plain GET
    assert srv.document(refresh=True) is not first  # refresh recomputes

    httpd = HTTPServer(("127.0.0.1", 0), srv.handler_class())
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert r.status == 200 and r.read() == b"ok"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=60) as r:
            body = r.read().decode()
            assert r.status == 200
            assert body.count("<section>") == 7 and "Refresh data" in body
    finally:
        httpd.shutdown()


def test_bench_emit_trims_and_writes_atomically(tmp_path):
    """_emit (VERDICT r7 item 1): every emitted line must fit the driver's
    2000-char stdout tail by dropping the FASTEST queries first, the full
    dict must always land in the detail file, the original out dict must
    stay untrimmed for later cumulative emits, and the detail write must
    be tmp+rename (no truncated file visible at the final path)."""
    import io
    import json
    import os
    from contextlib import redirect_stdout

    spec = importlib.util.spec_from_file_location(
        "bench2", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    queries = {f"query_name_{i:04d}": round(0.01 * i, 2) for i in range(400)}
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
    }
    detail = {"sf": 0.1, "queries": queries}
    dpath = str(tmp_path / "detail.json")
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._emit(out, detail, dpath)
    line = buf.getvalue().strip().splitlines()[-1]
    assert len(line) <= 1900
    emitted = json.loads(line)
    # slowest entries survive the trim; the fastest are spilled
    kept = set(emitted["queries"])
    assert "query_name_0399" in kept and "query_name_0001" not in kept
    assert "fastest in bench_detail.json" in emitted["queries_spilled"]
    # the caller's dict is untouched (later cumulative emits need it full)
    assert len(out["queries"]) == 400 and "queries_spilled" not in out
    # detail file carries the FULL set, and no tmp residue remains
    assert len(json.load(open(dpath))["queries"]) == 400
    assert not os.path.exists(dpath + ".tmp")
