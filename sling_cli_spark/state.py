"""Cross-run incremental state store.

The reference's ``sling state`` backend is a closed-source stub
(``core/sling/task_func.go:192-201``); its observable contract is a
per-(replication, stream) watermark that survives runs. Here: one JSON
file per store, atomic replace on write (driver-side metadata — the
watermark is a scalar, never data-sized).
"""

from __future__ import annotations

import json
import os
import tempfile
from datetime import date, datetime
from typing import Any


def _encode(v: Any) -> Any:
    if isinstance(v, (datetime, date)):
        return {"__ts__": v.isoformat()}
    return v


def _decode(v: Any) -> Any:
    if isinstance(v, dict) and "__ts__" in v:
        try:
            return datetime.fromisoformat(v["__ts__"])
        except ValueError:
            return v["__ts__"]
    return v


class StateStore:
    """JSON-file watermark store: get/set per stream key."""

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> dict[str, Any]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def get(self, stream: str, key: str = "watermark") -> Any:
        return _decode(self._load().get(stream, {}).get(key))

    def set(self, stream: str, value: Any, key: str = "watermark") -> None:
        data = self._load()
        data.setdefault(stream, {})[key] = _encode(value)
        d = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(data, f, default=str)
            os.replace(tmp, self.path)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def clear(self, stream: str | None = None) -> None:
        if stream is None:
            if os.path.exists(self.path):
                os.unlink(self.path)
            return
        data = self._load()
        data.pop(stream, None)
        with open(self.path, "w") as f:
            json.dump(data, f, default=str)
