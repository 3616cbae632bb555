"""Index aliases — ES alias / atomic-swap analogue.

ES aliases let a serving layer point `search-live` at a physical index and
atomically repoint it after a rebuild (the zero-downtime reindex pattern;
the reference rebuilds its ES indexes in place and relies on ES refresh
semantics instead). Here an alias registry is one JSON file mapping alias
name -> physical index root; updates go through the store IO's ``put_text``
(atomic rename / single-object PUT), so a reader never observes a torn
registry and a swap is a single atomic publish.

Usage:
    reg = AliasRegistry("/data/indexes/aliases.json")
    reg.set("live", "/data/indexes/build_42")
    SearchEngine(spark, reg.resolve("live"))
    reg.swap("live", "/data/indexes/build_43")   # atomic repoint
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from gofias_spark.index.iofs import resolve_io


class AliasRegistry:
    def __init__(self, path: str | os.PathLike, io=None):
        self.path = Path(path)
        self.io = io if io is not None else resolve_io(self.path.parent)

    def _read(self) -> dict[str, str]:
        if not self.path.exists():
            return {}
        return json.loads(self.path.read_text())

    def _write(self, aliases: dict[str, str]) -> None:
        self.io.put_text(
            self.path, json.dumps(aliases, indent=2, sort_keys=True)
        )

    def list(self) -> dict[str, str]:
        return self._read()

    def set(self, alias: str, index_root: str | os.PathLike) -> None:
        """Create or repoint an alias (ES `indices.update_aliases` with
        remove+add in one atomic action). The target must be an existing
        index (manifest present) — a swap to a half-built root is the
        failure this guard exists for."""
        if not alias or "/" in alias:
            raise ValueError(f"bad alias name {alias!r}")
        root = Path(index_root)
        if not (root / "manifest.json").exists():
            raise ValueError(f"no index manifest at {root}")
        aliases = self._read()
        aliases[alias] = str(root)
        self._write(aliases)

    # explicit name for the zero-downtime rebuild pattern
    swap = set

    def remove(self, alias: str) -> None:
        aliases = self._read()
        if alias not in aliases:
            raise ValueError(f"no alias {alias!r}")
        del aliases[alias]
        self._write(aliases)

    def resolve(self, name_or_path: str | os.PathLike) -> str:
        """Alias name -> its index root; anything that is not a registered
        alias passes through unchanged (so callers can accept either)."""
        return self._read().get(str(name_or_path), str(name_or_path))
