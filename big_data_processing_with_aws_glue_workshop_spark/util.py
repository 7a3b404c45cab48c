"""Small shared utilities."""

from __future__ import annotations

import json
import os


def atomic_write_json(path: str, obj) -> None:
    """Write JSON durably-by-rename: serialize to ``path + '.tmp'`` then
    ``os.replace`` — readers see either the old or the new complete file,
    never a torn write. The parent directory is created if missing."""
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
