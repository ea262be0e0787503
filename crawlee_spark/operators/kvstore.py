"""KeyValueStore + RecoverableState: named blobs and auto-persisted state.

Reference: ``packages/core/src/storages/key_value_store.ts`` (setValue/
getValue/getAutoSavedValue, key_value_store.ts:249, 720-723) and
``RecoverableState`` (packages/core/src/recoverable_state.ts:75+). Used for
crawler checkpoints: statistics snapshots (SDK_CRAWLER_STATISTICS_*,
statistics.ts:135), session-pool state (SDK_SESSION_POOL_STATE,
session_pool/consts.ts:2), request-list state (REQUEST_LIST_STATE).

Here: one JSON/bytes file per key under a directory, atomic rename per
write (same commit discipline as the frontier manifest). Driver-side by
design — these are small control-plane blobs, not data-plane tables; the
data plane is the frontier/dataset parquet."""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from typing import Any

_KEY_RE = re.compile(r"^[a-zA-Z0-9!\-_.'()]{1,256}$")  # platform key charset


@dataclass
class KeyValueStore:
    root: str

    def __post_init__(self):
        os.makedirs(self.root, exist_ok=True)

    def _path(self, key: str, ext: str) -> str:
        if not _KEY_RE.match(key):
            raise ValueError(f"invalid key-value store key: {key!r}")
        return os.path.join(self.root, f"{key}.{ext}")

    def set_value(self, key: str, value: Any, *, content_type: str = "application/json") -> None:
        """setValue; ``None`` deletes the record (key_value_store.ts
        contract)."""
        json_path, bin_path = self._path(key, "json"), self._path(key, "bin")
        if value is None:
            for p in (json_path, bin_path):
                if os.path.exists(p):
                    os.remove(p)
            return
        if content_type == "application/json":
            tmp = json_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(value, f, indent=1, sort_keys=True)
            os.replace(tmp, json_path)
        else:
            tmp = bin_path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(value if isinstance(value, bytes) else bytes(value))
            os.replace(tmp, bin_path)

    def record_exists(self, key: str) -> bool:
        """recordExists (key_value_store.ts:242-247)."""
        return os.path.exists(self._path(key, "json")) or os.path.exists(
            self._path(key, "bin")
        )

    def get_value(self, key: str, default: Any = None) -> Any:
        json_path, bin_path = self._path(key, "json"), self._path(key, "bin")
        if os.path.exists(json_path):
            with open(json_path) as f:
                return json.load(f)
        if os.path.exists(bin_path):
            with open(bin_path, "rb") as f:
                return f.read()
        return default

    def list_keys(self, *, exclusive_start_key: str | None = None, limit: int | None = None) -> list[str]:
        """listKeys (key_value_store.ts:393-437): keys in lexicographic order,
        optionally after ``exclusive_start_key``, capped at ``limit``."""
        keys = sorted(
            {os.path.splitext(f)[0] for f in os.listdir(self.root) if f.endswith((".json", ".bin"))}
        )
        if exclusive_start_key is not None:
            keys = [k for k in keys if k > exclusive_start_key]
        return keys[:limit] if limit is not None else keys

    def for_each_key(self, fn, *, exclusive_start_key: str | None = None) -> int:
        """forEachKey: call ``fn(key, index)`` per key in order; returns the
        count (key_value_store.ts:446-462)."""
        keys = self.list_keys(exclusive_start_key=exclusive_start_key)
        for i, k in enumerate(keys):
            fn(k, i)
        return len(keys)

    def drop(self) -> None:
        """drop(): remove the whole store (key_value_store.ts:331-338)."""
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)

    def get_auto_saved_value(self, key: str, default_value: dict | None = None) -> "RecoverableState":
        """getAutoSavedValue: a mutable dict persisted via ``.save()``
        (the reference persists on an interval + at migration events; here
        saving is explicit per round — the engine calls it at commit)."""
        return RecoverableState(self, key, self.get_value(key, default_value or {}))


@dataclass
class RecoverableState:
    store: KeyValueStore
    key: str
    value: dict

    def save(self) -> None:
        self.store.set_value(self.key, self.value)
