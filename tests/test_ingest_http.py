"""S1 ingest parity: drive ``ingest_http`` + ``ingest_sweep`` over a real
HTTP server (stdlib ``http.server``, loopback only — no network) and prove
the URL template and landing layout match the reference contract
(``/root/reference/src/ingest_data.py:14-65``):
``{trip_type}_tripdata_{year}-{month:02d}.parquet`` fetched per (fleet,
month) into ``trip_type=…/partition_date=YYYYMM/…``."""

from __future__ import annotations

import functools
import http.server
import threading

import pytest

from nyc_taxi_data_pipeline_elt_spark.sources import ingest

FLEETS = ["yellow", "green"]
MONTHS = [1, 2]


@pytest.fixture()
def cdn(tmp_path):
    """A local stand-in for the TLC CDN serving the reference's file names."""
    root = tmp_path / "cdn"
    (root / "trip-data").mkdir(parents=True)
    for fleet in FLEETS:
        for m in MONTHS:
            (root / "trip-data" / f"{fleet}_tripdata_2023-{m:02d}.parquet").write_bytes(
                f"payload:{fleet}:{m}".encode()
            )
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(root)
    )
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
    finally:
        httpd.shutdown()


def test_default_template_is_reference_tlc_url():
    assert ingest.TLC_URL_TEMPLATE.format(
        trip_type="yellow", year=2023, month=3
    ) == (
        "https://d37ci6vzurychx.cloudfront.net/trip-data/"
        "yellow_tripdata_2023-03.parquet"
    )


def test_ingest_http_single_file(cdn, tmp_path):
    landing = tmp_path / "landing"
    template = cdn + "/trip-data/{trip_type}_tripdata_{year}-{month:02d}.parquet"
    dst = ingest.ingest_http(
        str(landing), "yellow", 2023, 1, url_template=template
    )
    assert dst.read_bytes() == b"payload:yellow:1"
    assert dst == (
        landing
        / "trip_type=yellow"
        / "partition_date=202301"
        / "yellow_tripdata_2023-01.parquet"
    )


def test_ingest_sweep_end_to_end(cdn, tmp_path):
    """The documented parallel fan-out over (fleet, month), through real
    HTTP, lands every file under the reference's Hive key layout with the
    right bytes."""
    landing = tmp_path / "landing"
    template = cdn + "/trip-data/{trip_type}_tripdata_{year}-{month:02d}.parquet"
    fetch = functools.partial(ingest.ingest_http, url_template=template)
    paths = ingest.ingest_sweep(str(landing), 2023, MONTHS, FLEETS, fetch=fetch)
    got = sorted(str(p.relative_to(landing)) for p in paths)
    assert got == sorted(
        f"trip_type={f}/partition_date=2023{m:02d}/{f}_tripdata_2023-{m:02d}.parquet"
        for f in FLEETS
        for m in MONTHS
    )
    for f in FLEETS:
        for m in MONTHS:
            p = ingest.landing_key(str(landing), f, 2023, m)
            assert p.read_bytes() == f"payload:{f}:{m}".encode()


def test_ingest_http_missing_month_raises(cdn, tmp_path):
    """Fail-fast contract (O3): a missing upstream file raises instead of
    landing an empty object."""
    template = cdn + "/trip-data/{trip_type}_tripdata_{year}-{month:02d}.parquet"
    with pytest.raises(Exception):
        ingest.ingest_http(
            str(tmp_path / "landing"), "yellow", 2023, 12, url_template=template
        )
    assert not ingest.landing_key(
        str(tmp_path / "landing"), "yellow", 2023, 12
    ).exists()
