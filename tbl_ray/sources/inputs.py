"""Input path gathering — files / dirs / globs / trees -> sorted path list.

Mirrors the reference's selection rules
(crates/tbl-core/src/filesystem/{gather.rs,inputs.rs}):

- a path argument may be a file, a directory, or a glob pattern;
- directories list non-recursively by default, recursively with ``tree=True``
  (gather.rs:6-35);
- only ``.parquet`` files are tabular (gather.rs:38-48); non-tabular paths
  are skipped with a warning;
- the final list is SORTED — this fixes the file-concatenation order that
  head/tail/offset semantics depend on (inputs.rs:34-36).
"""

from __future__ import annotations

import glob as _glob
import os
import sys


def is_tabular_file(path: str) -> bool:
    """Only .parquet today, matching gather.rs:38-48."""
    return path.endswith(".parquet")


def _list_dir(path: str, tree: bool) -> list[str]:
    if tree:
        out = []
        for root, _dirs, files in os.walk(path):
            out.extend(os.path.join(root, f) for f in files)
        return out
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if os.path.isfile(os.path.join(path, f))
    ]


def gather_paths(
    inputs: list[str] | None = None, *, tree: bool = False, warn: bool = True
) -> list[str]:
    """Resolve inputs (default: CWD) to a sorted list of parquet paths."""
    if not inputs:
        inputs = ["."]
    found: list[str] = []
    for inp in inputs:
        if os.path.isfile(inp):
            if is_tabular_file(inp):
                found.append(inp)
            elif warn:
                print(f"skipping non-tabular file: {inp}", file=sys.stderr)
        elif os.path.isdir(inp):
            found.extend(p for p in _list_dir(inp, tree) if is_tabular_file(p))
        else:
            # glob pattern
            matches = _glob.glob(inp, recursive=True)
            if not matches and warn:
                print(f"no files match: {inp}", file=sys.stderr)
            found.extend(p for p in matches if os.path.isfile(p) and is_tabular_file(p))
    return sorted(set(found))
