"""Minimal in-memory stand-in for the `redis` package (redis-py surface
actually used by the engine: `Redis(host, port, decode_responses)` with
`set`/`delete`/`get`). Vendored for tests only — the sandbox has no redis
server or client package, and `redis_kv_client`'s adapter path
(`streaming/pipeline.py`) must still be exercised end-to-end (VERDICT r2
item 4)."""

from __future__ import annotations


class Redis:
    def __init__(
        self,
        host: str = "localhost",
        port: int = 6379,
        decode_responses: bool = False,
        **_: object,
    ) -> None:
        self.host = host
        self.port = port
        self.decode_responses = decode_responses
        self._store: dict[str, str] = {}

    def set(self, name: str, value: str) -> bool:
        self._store[str(name)] = str(value)
        return True

    def get(self, name: str):
        v = self._store.get(str(name))
        if v is None or self.decode_responses:
            return v
        return v.encode()

    def delete(self, *names: str) -> int:
        n = 0
        for name in names:
            n += self._store.pop(str(name), None) is not None
        return n
