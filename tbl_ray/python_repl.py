"""Interactive escape hatch — the reference's ``--df`` / ``--lf`` modes.

The reference spawns ipython with generated polars code
(crates/tbl-cli/src/python.rs:5-68). The Ray equivalent hands the user a
live ``ray.data.Dataset`` (``--lf``-style lazy handle) or a collected
pyarrow Table (``--df``-style): we generate the bootstrap code, then exec
an interactive session with it.
"""

from __future__ import annotations

import subprocess
import sys


def interactive_code(paths: list[str], lazy: bool = True) -> str:
    """The bootstrap source shown to (and run for) the user."""
    paths_str = ",\n    ".join(repr(p) for p in paths)
    if lazy:
        tail = (
            "ds = ray.data.read_parquet(inputs)\n"
            "print('# lazy Dataset bound to `ds` — ds.show(), ds.schema(), "
            "ds.map_batches(...)')"
        )
    else:
        tail = (
            "import pyarrow as pa\n"
            "# NOTE: --df collects the WHOLE input to the driver (the\n"
            "# reference's collect-to-DataFrame semantics); cap with -n\n"
            "# or use the lazy `ds` mode for big inputs\n"
            "df = pa.Table.from_pylist("
            "ray.data.read_parquet(inputs).take_all()).to_pandas()\n"
            "print(df)\n"
            "print('# collected DataFrame bound to `df` (FULL input on "
            "the driver; use lazy mode or -n for big data)')"
        )
    return (
        "import ray\n"
        "if not ray.is_initialized():\n"
        "    ray.init(address='local', include_dashboard=False, "
        "logging_level='ERROR')\n"
        "import ray.data\n"
        f"inputs = [\n    {paths_str}\n]\n"
        f"{tail}\n"
    )


def launch_interactive(
    paths: list[str], lazy: bool = True, executable: str | None = None
) -> int:
    """Spawn an interactive python with the dataset pre-loaded."""
    code = interactive_code(paths, lazy)
    exe = executable or sys.executable
    return subprocess.call([exe, "-i", "-c", code])
