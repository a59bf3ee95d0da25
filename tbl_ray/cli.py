"""CLI — the reference's `tbl` surface on the Ray engine.

`python -m tbl_ray.cli [PATHS] [options]` mirrors the reference CLI
(crates/tbl-cli/src/cli/args.rs:197-444): the data command with the
14-transform flags, `ls` and `schema` subcommands, the seven-way output
mode router (crates/tbl-cli/src/cli/subcommands/data.rs:30-50) and the
summary + confirm gate (data.rs:105-147; non-interactive here: disk-write
modes require --confirm, --dry previews). The stubbed partition modes are
REAL in this engine (tbl_ray.stages.partition), and --encode/--decode
expose the codec job (our north-rule extension).

This module owns its Ray session (guarded init) — library code never does.
"""

from __future__ import annotations

import argparse
import os
import sys

from tbl_ray.formats import format_bytes, format_with_commas


def _nonneg(v: str) -> int:
    """Row-count arguments are unsigned in the reference (Rust usize via
    clap rejects negatives); a negative here would silently slice to an
    empty or shifted window instead."""
    n = int(v)
    if n < 0:
        raise argparse.ArgumentTypeError(f"must be >= 0 (got {n})")
    return n


def _build_ls_parser() -> argparse.ArgumentParser:
    ls = argparse.ArgumentParser(prog="tbl-ray ls")
    ls.add_argument("paths", nargs="*", default=None)
    ls.add_argument("--tree", action="store_true")
    ls.add_argument("--absolute", action="store_true")
    ls.add_argument("-n", type=int, default=None)
    return ls


def _build_schema_parser() -> argparse.ArgumentParser:
    sc = argparse.ArgumentParser(prog="tbl-ray schema")
    sc.add_argument("paths", nargs="*", default=None)
    sc.add_argument("--tree", action="store_true")
    sc.add_argument("-n", type=int, default=None)
    return sc


def _build_parser() -> argparse.ArgumentParser:
    """The data command (no subcommand — reference args.rs:20-25);
    `ls`/`schema` are dispatched on the first token in main()."""
    d = argparse.ArgumentParser(
        prog="tbl-ray", description="Ray-Data-native tbl: read/transform/write parquet"
    )
    d.add_argument("paths", nargs="*", default=None)
    d.add_argument("--tree", action="store_true")
    # transforms (fixed application order regardless of flag order)
    d.add_argument("--columns", "--select", dest="select", nargs="+", default=[])
    d.add_argument("--drop", nargs="+", default=[])
    d.add_argument("--with-columns", "--with", dest="with_columns", nargs="+", default=[])
    d.add_argument("--rename", nargs="+", default=[])
    d.add_argument("--cast", nargs="+", default=[])
    d.add_argument("--set", nargs="+", default=[])
    d.add_argument("--nullify", nargs="+", default=[])
    d.add_argument("--replace", nargs="+", default=[])
    d.add_argument("--filter", nargs="+", default=[])
    d.add_argument("--sort", nargs="+", default=[])
    d.add_argument("--head", "--limit", dest="head", type=_nonneg, default=None)
    d.add_argument("--tail", type=_nonneg, default=None)
    d.add_argument("--offset", type=_nonneg, default=None)
    d.add_argument("--value-counts", dest="value_counts", default=None)
    # output
    d.add_argument("--no-summary", action="store_true")
    d.add_argument("-n", dest="n_rows", default=None, help="stdout rows (or 'all')")
    d.add_argument("--csv", action="store_true")
    d.add_argument("--json", action="store_true")
    d.add_argument("--jsonl", action="store_true")
    d.add_argument("--hex", action="store_true")
    d.add_argument("--inplace", action="store_true")
    d.add_argument("--output-file", dest="output_file", default=None)
    d.add_argument("--output-dir", dest="output_dir", default=None)
    d.add_argument("--output-prefix", dest="output_prefix", default=None)
    d.add_argument("--output-postfix", dest="output_postfix", default=None)
    d.add_argument("--partition", default=None, metavar="COLUMN")
    d.add_argument("--partition-by-value", dest="partition_by_value", type=int, default=None)
    d.add_argument("--partition-by-rows", dest="partition_by_rows", type=int, default=None)
    d.add_argument("--partition-by-bytes", dest="partition_by_bytes", type=int, default=None)
    # north-rule extensions
    d.add_argument("--df", action="store_true", help="interactive python with a collected DataFrame")
    d.add_argument("--lf", action="store_true", help="interactive python with a lazy Dataset")
    d.add_argument("--executable", default=None, help="python executable for --df/--lf")
    d.add_argument("--encode", action="store_true", help="codec-encode to --output-dir (resumable job)")
    d.add_argument("--decode", action="store_true", help="decode an encoded dir back to parquet")
    d.add_argument("--codec", action="append", default=[], metavar="COL=CODEC",
                   help="force a codec for a column in --encode mode (repeatable)")
    d.add_argument("--effort", choices=("ratio", "balanced", "speed"), default=None,
                   help="codec-selection effort for --encode (default: balanced, "
                        "or $TBL_RAY_CODEC_EFFORT); 'ratio' minimizes on-disk "
                        "bytes (zstd-12 container, ~2x encode CPU), 'balanced' "
                        "probes the zstd container and skips codecs that don't "
                        "shrink the file, 'speed' skips probes entirely")
    d.add_argument("--on-error", dest="on_error", choices=("raise", "skip"),
                   default="raise",
                   help="--encode: skip partitions whose read/encode fails "
                        "(recorded in the manifest + report; resume retries "
                        "them) instead of aborting the job")
    d.add_argument("--no-resume", action="store_true")
    d.add_argument("--confirm", action="store_true")
    d.add_argument("--dry", action="store_true")
    d.add_argument("--num-cpus", type=int, default=None)
    return d


def decide_output_mode(args) -> str:
    """Exactly one of the reference's output modes (data.rs:30-50)."""
    partitioning = bool(
        args.partition or args.partition_by_rows or args.partition_by_bytes
    )
    modes = [
        # --decode/--encode/partition consume --output-dir/--output-file as
        # their own IO destinations
        ("single_file", args.output_file is not None and not args.decode),
        ("directory", args.output_dir is not None and not args.encode
         and not args.decode and not partitioning),
        ("inplace", args.inplace),
        ("partition", partitioning),
        ("encode", args.encode),
        ("decode", args.decode),
    ]
    chosen = [name for name, on in modes if on]
    if len(chosen) > 1:
        raise SystemExit(f"error: conflicting output modes: {chosen}")
    return chosen[0] if chosen else "stdout"


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # push-based sort shuffle: measured faster on the big exchanges
    # (join_shuffle 4.4 -> 3.3 s warm at sf0.1/32cpu), equal elsewhere,
    # and it is the strategy built for multi-node scale; set only in
    # engine-owned sessions (never on library import — the user's
    # context is theirs)
    try:
        ctx.shuffle_strategy = "sort_shuffle_push_based"
    except Exception:
        pass  # older Ray: keep the default


def _gather(paths, tree):
    from tbl_ray.sources.inputs import gather_paths

    return gather_paths(paths or [os.getcwd()], tree=tree)


def _spec_from_args(args):
    from tbl_ray.transforms import TransformSpec

    return TransformSpec(
        with_columns=args.with_columns,
        filter=args.filter,
        drop=args.drop,
        cast=args.cast,
        set=args.set,
        nullify=args.nullify,
        replace=args.replace,
        select=args.select,
        offset=args.offset,
        head=args.head,
        tail=args.tail,
        value_counts=args.value_counts,
        sort=args.sort,
        rename=args.rename,
    )


def _display_batches(ds):
    """Stream non-empty pyarrow batches with binary columns hex-encoded
    for display — the driver never holds more than one batch."""
    from tbl_ray.sinks.writers import hex_encode_binary_columns

    for t in ds.iter_batches(batch_format="pyarrow"):
        if t.num_rows:
            yield hex_encode_binary_columns(t)


def _print_stdout(ds, n_rows, hex_mode) -> None:
    """Pretty print first n rows + '<k> rows omitted' footer (output.rs:27-72).

    The capped default collects (bounded by the cap); ``-n all`` streams
    batch-wise so the driver RSS stays flat on big datasets."""
    import pyarrow as pa

    from tbl_ray.sinks.writers import hex_encode_binary_columns

    cap = None if n_rows == "all" else int(n_rows or 20)
    if cap is None:
        header = True
        for t in _display_batches(ds):
            print(t.to_pandas().to_string(index=False, header=header))
            header = False
        return
    total = ds.count()
    t = pa.Table.from_pylist(ds.limit(cap).take_all())
    if t.num_rows:
        t = hex_encode_binary_columns(t)  # binary always hex for display
    print(t.to_pandas().to_string(index=False))
    if total > cap:
        print(f"{total - cap} rows omitted")


_MODE_BLURBS = {
    "stdout": ("PRINT_TO_STDOUT", "loading {n} files and printing to stdout"),
    "single_file": (
        "SAVE_TO_ONE_FILE",
        "loading {n} files and merging result into 1 output file",
    ),
    "output_dir": (
        "SAVE_TO_NEW_DIR",
        "loading {n} files and saving results to new directory",
    ),
    "inplace": ("MODIFY_INPLACE", "modifying {n} files in-place"),
    "partition": ("REPARTITION", "repartitioning {n} files"),
    "interactive": (
        "INTERACTIVE",
        "starting interactive session, loading {n} files",
    ),
    "encode": ("ENCODE", "encoding {n} files into a partitioned job dir"),
    "decode": ("DECODE", "decoding an encoded job dir"),
}

# the reference's --transform flag names (summary.rs:60-82 wording)
_TRANSFORM_LABELS = [
    ("with_columns", "adding columns"),
    ("filter", "filtering rows"),
    ("drop", "dropping columns"),
    ("cast", "casting types"),
    ("set", "setting columns"),
    ("nullify", "nullifying columns"),
    ("replace", "replacing values"),
    ("select", "selecting columns"),
    ("offset", "skipping rows"),
    ("head", "keeping head"),
    ("tail", "keeping tail"),
    ("value_counts", "counting values"),
    ("sort", "sorting rows"),
    ("rename", "renaming columns"),
]


def _bullet(key, value=None, indent=0) -> None:
    pad = " " * indent
    if value is None:
        print(f"{pad}- {key}", file=sys.stderr)
    else:
        print(f"{pad}- {key}: {value}", file=sys.stderr)


def _summary(mode, in_paths, out_paths, spec) -> None:
    """Pre-run summary in the reference's three-section shape
    (summary.rs:5-141: Inputs / Transformations / Outputs, bullet lists,
    first 10 input files, total byte count)."""
    print("Inputs", file=sys.stderr)
    n_bytes = 0
    for p in in_paths:
        try:
            n_bytes += os.path.getsize(p)
        except OSError:
            pass
    _bullet("n_input_bytes", f"{n_bytes:,} ({format_bytes(n_bytes)})")
    _bullet("n_input_files", f"{len(in_paths):,}")
    for p in in_paths[:10]:
        _bullet(p, indent=4)
    if len(in_paths) > 10:
        _bullet("...", indent=4)

    print("Transformations", file=sys.stderr)
    transforming = False
    for attr, label in _TRANSFORM_LABELS:
        v = getattr(spec, attr, None)
        if v not in (None, [], {}):
            _bullet(label, v)
            transforming = True
    if not transforming:
        print("[no transformations]", file=sys.stderr)

    print("Outputs", file=sys.stderr)
    name, blurb = _MODE_BLURBS.get(mode, (str(mode).upper(), "{n} files"))
    _bullet("output_mode", name)
    _bullet("summary", blurb.format(n=len(in_paths)))
    if out_paths:
        shown = out_paths if isinstance(out_paths, (list, tuple)) else [out_paths]
        _bullet("n_output_files", f"{len(shown):,}")
        for p in list(shown)[:10]:
            _bullet(p, indent=4)


def _confirm_gate(args, writes: bool) -> bool:
    """Disk writes require --confirm (reference gates via inquire prompt,
    data.rs:105-147); --dry always previews only."""
    if args.dry:
        print("dry run: no files written", file=sys.stderr)
        return False
    if writes and not args.confirm:
        print("refusing to write without --confirm (or use --dry)", file=sys.stderr)
        return False
    return True


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "ls":
        return _ls(_build_ls_parser().parse_args(argv[1:]))
    if argv and argv[0] == "verify":
        vp = argparse.ArgumentParser(prog="tbl-ray verify")
        vp.add_argument("out_dir", help="encoded job directory to audit")
        va = vp.parse_args(argv[1:])
        from tbl_ray.pipelines.encode_job import verify_job

        v = verify_job(va.out_dir)
        print(v)
        return 0 if not (v["missing"] or v["corrupt"]) else 1
    if argv and argv[0] in ("schema", "schemas"):
        # `schemas` (combined summary across groups) is a stub in the
        # reference (schemas.rs:3-6); here it is the same grouped view
        return _schema(_build_schema_parser().parse_args(argv[1:]))
    return _data(_build_parser().parse_args(argv))


def _ls_encoded(out_dir: str, args) -> int:
    """Manifest-driven listing of an encode-job output: per-partition
    rows / input / encoded / on-disk bytes, no data read."""
    from tbl_ray.pipelines.encode_job import load_manifest

    entries = sorted(
        load_manifest(out_dir).values(), key=lambda e: e["out_path"]
    )
    failed = [e for e in entries if e.get("error")]
    ok = [e for e in entries if not e.get("error")]
    cap = args.n or len(ok)
    tot_rows = tot_in = tot_file = 0
    for e in ok:
        tot_rows += e["num_rows"]
        tot_in += e["input_bytes"]
        tot_file += e["file_bytes"]
    for e in ok[:cap]:
        name = e["out_path"] if args.absolute else os.path.basename(e["out_path"])
        print(
            f"{name}  {format_with_commas(e['num_rows'])} rows"
            f"  in={format_bytes(e['input_bytes'])}"
            f"  disk={format_bytes(e['file_bytes'])}"
        )
    if len(ok) > cap:
        print(f"... {len(ok) - cap} more partitions")
    for e in failed:
        print(f"FAILED {e.get('partition_id')}: {e.get('error')}")
    ratio = tot_file / max(tot_in, 1)
    tail = f", {len(failed)} FAILED (partial job)" if failed else ""
    print(
        f"{len(ok)} encoded partitions, {format_with_commas(tot_rows)} rows, "
        f"{format_bytes(tot_file)} on disk ({ratio:.3f}x of input){tail}"
    )
    return 0


def _ls(args) -> int:
    from tbl_ray.sources.encoded import is_encoded_dir
    from tbl_ray.sources.summary import summarize_file

    if args.paths and len(args.paths) == 1 and is_encoded_dir(args.paths[0]):
        return _ls_encoded(args.paths[0], args)
    paths = _gather(args.paths, args.tree)
    total_rows = 0
    total_bytes = 0
    cap = args.n or len(paths)
    for p in paths[:cap]:
        s = summarize_file(p)
        total_rows += s.n_rows
        total_bytes += s.n_bytes_compressed
        name = p if args.absolute else os.path.basename(p)
        print(
            f"{name}  {format_with_commas(s.n_rows)} rows  "
            f"{format_bytes(s.n_bytes_compressed)}"
        )
    if len(paths) > cap:
        print(f"... {len(paths) - cap} more files")
    print(
        f"{len(paths)} files, {format_with_commas(total_rows)} rows, "
        f"{format_bytes(total_bytes)} ({total_bytes:,} bytes)"
    )
    return 0


def _schema_encoded(out_dir: str, args) -> int:
    """Decoded schema + per-column codec usage and zone-map coverage of
    an encode-job output — all from footers and the manifest."""
    from tbl_ray.pipelines.encode_job import load_manifest
    from tbl_ray.sources.encoded import encoded_schema_names

    entries = list(load_manifest(out_dir).values())
    names = encoded_schema_names(out_dir)
    # dtype strings from the first non-empty partition's chunk fields
    # are not stored flat; the manifest's zone-map stats carry the type
    # for mappable columns, codec votes carry usage
    codec_use: dict[str, dict[str, int]] = {}
    stats_cols: dict[str, str] = {}
    rows = 0
    for e in entries:
        rows += e["num_rows"]
        for col, use in (e.get("codecs") or {}).items():
            agg = codec_use.setdefault(col, {})
            for codec, n in use.items():
                agg[codec] = agg.get(codec, 0) + n
        for col, s in (e.get("stats") or {}).items():
            stats_cols.setdefault(col, s.get("t", "?"))
    print(f"encoded job: {len(entries)} partitions, {rows} rows")
    for name in names[: args.n or len(names)]:
        codecs = ",".join(
            f"{c}x{n}" for c, n in sorted((codec_use.get(name) or {}).items())
        )
        zm = stats_cols.get(name)
        zone = f"zone-map[{zm}]" if zm else "no zone-map"
        print(f"  {name}: codecs={codecs or '?'}  {zone}")
    return 0


def _schema(args) -> int:
    from tbl_ray.sources.encoded import is_encoded_dir
    from tbl_ray.sources.summary import summarize_by_schema, summarize_files

    if args.paths and len(args.paths) == 1 and is_encoded_dir(args.paths[0]):
        return _schema_encoded(args.paths[0], args)
    paths = _gather(args.paths, args.tree)
    groups = summarize_by_schema(summarize_files(paths))
    shown = [summ for _schema, summ in groups.values()]
    shown.sort(key=lambda s: -s.n_rows)
    for i, summ in enumerate(shown[: args.n or len(shown)]):
        print(f"schema group {i}: {summ.n_files} files, {summ.n_rows} rows")
        for name, col in summ.columns.items():
            pct = (
                100.0 * col.compressed_bytes / max(summ.n_bytes_compressed, 1)
            )
            print(
                f"  {name}: {col.dtype}  disk={format_bytes(col.compressed_bytes)}"
                f"  full={format_bytes(col.uncompressed_bytes)}"
                f"  ({pct:.1f}% of disk)"
            )
    return 0


def _data(args) -> int:
    if args.df or args.lf:
        from tbl_ray.python_repl import launch_interactive

        paths = _gather(args.paths, args.tree)
        return launch_interactive(paths, lazy=args.lf, executable=args.executable)
    mode = decide_output_mode(args)
    if mode == "decode":  # input is the encoded dir, not gathered paths
        if not args.output_dir or not args.output_file:
            raise SystemExit(
                "--decode requires --output-dir (encoded) and --output-file"
            )
        if not _confirm_gate(args, writes=True):
            return 0
        _init_ray(args.num_cpus)
        from tbl_ray.pipelines.encode_job import decode_job_output
        from tbl_ray.sinks.writers import write_parquet_atomic

        write_parquet_atomic(decode_job_output(args.output_dir), args.output_file)
        return 0
    from tbl_ray.sources.encoded import is_encoded_dir

    # a single encode-job output dir is a first-class input: decode with
    # zone-map pruning + projection pushdown instead of gathering (which
    # would feed the RAW encoded payload rows into the chain)
    enc_dir = None
    if args.paths and len(args.paths) == 1 and is_encoded_dir(args.paths[0]):
        enc_dir = args.paths[0]
        paths = [enc_dir]
    else:
        paths = _gather(args.paths, args.tree)
        if not paths:
            print("no tabular files found", file=sys.stderr)
            return 1
    spec = _spec_from_args(args)
    if enc_dir is not None and mode in ("encode", "directory", "inplace"):
        raise SystemExit(
            "encoded-dir input supports stdout, --output-file, and partition "
            "modes; use --decode + --output-file for a plain parquet copy "
            f"(got mode {mode!r})"
        )

    _init_ray(args.num_cpus)
    from tbl_ray.sources import read_table
    from tbl_ray.sources.parquet import read_for_spec
    from tbl_ray.transforms import apply_transforms

    def _source_ds():
        if enc_dir is not None:
            from tbl_ray.sources.encoded import read_encoded_for_spec

            return read_encoded_for_spec(enc_dir, spec)
        return read_for_spec(paths, spec)

    if mode == "stdout":
        ds = apply_transforms(_source_ds(), spec)
        if args.csv:
            # stream batch-wise: header once, then rows — flat driver RSS
            header = True
            for t in _display_batches(ds):
                sys.stdout.write(t.to_pandas().to_csv(index=False, header=header))
                header = False
            if header:  # empty result: still emit the header row
                sys.stdout.write(",".join(ds.schema().names) + "\n")
        elif args.jsonl:
            for t in _display_batches(ds):
                s = t.to_pandas().to_json(
                    orient="records", lines=True, default_handler=str
                )
                if s:
                    sys.stdout.write(s)
                    sys.stdout.write("\n")
        elif args.json:
            # one JSON array, streamed: strip each batch's brackets and
            # join record runs with commas
            sys.stdout.write("[")
            first = True
            for t in _display_batches(ds):
                inner = t.to_pandas().to_json(
                    orient="records", default_handler=str
                )[1:-1]
                if inner:
                    if not first:
                        sys.stdout.write(",")
                    sys.stdout.write(inner)
                    first = False
            sys.stdout.write("]\n")
        else:
            _print_stdout(ds, args.n_rows, args.hex)
        return 0

    if mode == "encode":
        if not args.output_dir:
            raise SystemExit("--encode requires --output-dir")
        if not _confirm_gate(args, writes=True):
            return 0
        from tbl_ray.pipelines.encode_job import run_encode_job

        codecs = None
        if args.codec:
            codecs = dict(c.split("=", 1) for c in args.codec)
        report = run_encode_job(
            paths, args.output_dir, resume=not args.no_resume, codecs=codecs,
            effort=args.effort, on_error=args.on_error,
        )
        print(report)
        return 0

    if mode == "partition":
        if not args.output_dir:
            raise SystemExit("partition modes require --output-dir")
        if not _confirm_gate(args, writes=True):
            return 0
        ds = apply_transforms(_source_ds(), spec)
        from tbl_ray.stages.partition import (
            partition_by_bytes,
            partition_by_key,
            partition_by_rows,
            partition_by_value,
        )

        if args.partition and args.partition_by_value:
            rows = partition_by_value(
                ds, args.partition, args.output_dir, args.partition_by_value
            )
            print(f"wrote {len(rows)} range files")
        elif args.partition:
            rows = partition_by_key(
                ds, args.partition, args.output_dir,
                max_rows_per_file=args.partition_by_rows,
            )
            print(f"wrote {len(rows)} partition files")
        elif args.partition_by_rows:
            partition_by_rows(ds, args.output_dir, args.partition_by_rows)
        else:
            partition_by_bytes(ds, args.output_dir, args.partition_by_bytes)
        return 0

    if mode == "single_file":
        ds = apply_transforms(_source_ds(), spec)
        _summary(mode, paths, [args.output_file], spec)
        if not _confirm_gate(args, writes=True):
            return 0
        from tbl_ray.sinks.writers import write_csv, write_json, write_parquet_atomic

        if args.csv:
            write_csv(ds, args.output_file)
        elif args.json or args.jsonl:
            write_json(ds, args.output_file, lines=args.jsonl)
        else:
            write_parquet_atomic(ds, args.output_file)
        return 0

    # directory / inplace: one pipeline per input file (data.rs:71-93)
    from tbl_ray.sinks.writers import write_parquet_atomic
    from tbl_ray.sources.outputs import OutputPathSpec, get_output_paths

    in_paths, out_paths = get_output_paths(
        OutputPathSpec(
            inputs=paths,
            output_dir=None if mode == "inplace" else args.output_dir,
            tree=args.tree,
            file_prefix=args.output_prefix,
            file_postfix=args.output_postfix,
            sort=True,
        )
    )
    _summary(mode, in_paths, out_paths, spec)
    if not _confirm_gate(args, writes=True):
        return 0
    os.makedirs(args.output_dir, exist_ok=True) if args.output_dir else None
    for ip, op in zip(in_paths, out_paths):
        os.makedirs(os.path.dirname(op) or ".", exist_ok=True)
        write_parquet_atomic(apply_transforms(read_for_spec([ip], spec), spec), op)
    print(f"wrote {len(out_paths)} file(s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
