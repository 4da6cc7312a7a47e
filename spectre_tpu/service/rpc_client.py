"""Typed JSON-RPC client SDK (prover/src/rpc_client.rs analog)."""
from __future__ import annotations

import json
import urllib.request


class Client:
    def __init__(self, url: str, timeout: float = 600.0):
        self.url = url
        self.timeout = timeout
        self._id = 0

    def call(self, method: str, params):
        self._id += 1
        body = json.dumps({
            "jsonrpc": "2.0", "id": self._id,
            "method": method, "params": params,
        }).encode()
        req = urllib.request.Request(
            self.url, data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            resp = json.load(r)
        if "error" in resp and resp["error"]:
            raise RuntimeError(f"rpc error: {resp['error']}")
        return resp["result"]

    def gen_evm_proof_step(self, finality_update, pubkeys, domain):
        return self.call("genEvmProof_SyncStepCompressed", [{
            "light_client_finality_update": finality_update,
            "pubkeys": pubkeys,
            "domain": domain,
        }])

    def gen_evm_proof_committee_update(self, light_client_update):
        return self.call("genEvmProof_CommitteeUpdateCompressed", [{
            "light_client_update": light_client_update,
        }])
