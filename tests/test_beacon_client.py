"""BeaconClient over a real local HTTP server (the beacon-api-client
analog was previously untested over its transport). A stub handler serves
canned beacon-API JSON; every typed endpoint is exercised end-to-end
through urllib."""
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from spectre_tpu.preprocessor.beacon import BeaconClient

ROUTES = {
    "/eth/v1/beacon/light_client/updates?start_period=7&count=1":
        [{"data": {"kind": "update", "period": 7}}],
    "/eth/v1/beacon/light_client/bootstrap/0xabc":
        {"data": {"kind": "bootstrap"}},
    "/eth/v1/beacon/light_client/finality_update":
        {"data": {"kind": "finality"}},
    "/eth/v1/beacon/headers/head":
        {"data": {"header": {"message": {"slot": "123"}}}},
    "/eth/v1/beacon/blocks/head/root":
        {"data": {"root": "0xdeadbeef"}},
    "/eth/v1/beacon/genesis":
        {"data": {"genesis_validators_root": "0x11", "genesis_time": "0"}},
    "/eth/v1/beacon/states/head/fork":
        {"data": {"current_version": "0x03000001"}},
}


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        body = ROUTES.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        data = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):   # quiet
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_all_endpoints(server):
    c = BeaconClient(server)
    assert c.light_client_update_at_period(7)["period"] == 7
    assert c.light_client_bootstrap("0xabc")["kind"] == "bootstrap"
    assert c.light_client_finality_update()["kind"] == "finality"
    assert c.beacon_header()["header"]["message"]["slot"] == "123"
    assert c.block_root("head") == "0xdeadbeef"
    assert c.genesis()["genesis_validators_root"] == "0x11"
    assert c.fork()["current_version"] == "0x03000001"


def test_missing_endpoint_raises(server):
    import urllib.error
    c = BeaconClient(server)
    with pytest.raises(urllib.error.HTTPError):
        c.get("/nope")


def test_http_retry_on_transient_errors(monkeypatch):
    """Transient failures (URLError/5xx) retry with backoff; 4xx raises
    immediately (reference retry-middleware analog)."""
    import urllib.error
    import urllib.request
    from spectre_tpu.preprocessor.beacon import BeaconClient

    calls = {"n": 0}

    class FakeResp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self):
            return b'{"data": 1}'

    def flaky(url, timeout=None):
        calls["n"] += 1
        if calls["n"] < 3:
            raise urllib.error.URLError("conn reset")
        return FakeResp()

    monkeypatch.setattr(urllib.request, "urlopen", flaky)
    monkeypatch.setattr("time.sleep", lambda s: None)
    c = BeaconClient("http://x", retries=3, backoff_s=0)
    assert c.get("/path") == {"data": 1}
    assert calls["n"] == 3

    calls["n"] = 0

    def forbidden(url, timeout=None):
        calls["n"] += 1
        raise urllib.error.HTTPError(url, 404, "nf", {}, None)

    monkeypatch.setattr(urllib.request, "urlopen", forbidden)
    import pytest as _pytest
    with _pytest.raises(urllib.error.HTTPError):
        c.get("/path")
    assert calls["n"] == 1  # no retry on 404
