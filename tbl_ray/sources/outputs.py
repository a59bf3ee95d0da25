"""Input→output path mapping for per-file output modes.

Re-implements the reference's path-mapping semantics (the only executable
spec it ships — crates/tbl-core/src/filesystem/{manipulate.rs:5-66,
outputs.rs:190-309} and the 24-case doc matrix at outputs.rs:311-354):

- file input: output = same dir (or ``output_dir``) + same file name;
- directory input, non-tree: each tabular file in the directory maps to
  ``output_dir`` (or stays in place);
- directory input, tree: the input directory is the reading tree root and
  ``output_dir`` (when given) becomes the writing tree root — relative
  subpaths are preserved;
- ``file_prefix``/``file_postfix`` wrap the file *stem* (extension kept);
- optional sort by output path; duplicate output paths are an error before
  any work runs (outputs.rs:296-306).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from tbl_ray.sources.inputs import is_tabular_file


class OutputPathError(ValueError):
    pass


def get_common_prefix(paths: list[str]) -> str:
    """Longest common *component-wise* path prefix (manipulate.rs:5-28)."""
    if not paths:
        raise OutputPathError("no paths given")
    split = [p.split(os.sep) for p in paths]
    common = split[0]
    for comps in split[1:]:
        keep = []
        for a, b in zip(common, comps):
            if a != b:
                break
            keep.append(a)
        common = keep
    return os.sep.join(common)


def convert_file_path(
    input_path: str,
    output_dir: str | None = None,
    file_prefix: str | None = None,
    file_postfix: str | None = None,
) -> str:
    """One file's output path (manipulate.rs:31-66): move into
    ``output_dir`` (same file name) then wrap the stem with prefix/postfix."""
    if output_dir is not None:
        output = os.path.join(output_dir, os.path.basename(input_path))
    else:
        output = input_path
    if file_prefix or file_postfix:
        d, name = os.path.split(output)
        stem, ext = os.path.splitext(name)
        output = os.path.join(
            d, f"{file_prefix or ''}{stem}{file_postfix or ''}{ext}"
        )
    return output


def _dir_tabular_files(path: str, tree: bool) -> list[str]:
    out: list[str] = []
    if tree:
        for root, _dirs, files in os.walk(path):
            for f in files:
                p = os.path.join(root, f)
                if is_tabular_file(p):
                    out.append(p)
    else:
        for f in os.listdir(path):
            p = os.path.join(path, f)
            if os.path.isfile(p) and is_tabular_file(p):
                out.append(p)
    return sorted(out)


@dataclass
class OutputPathSpec:
    """Builder-equivalent of the reference's OutputPathSpec (outputs.rs:6-75)."""

    inputs: list[str] | None = None
    output_dir: str | None = None
    tree: bool = False
    file_prefix: str | None = None
    file_postfix: str | None = None
    sort: bool = False


def get_output_paths(spec: OutputPathSpec) -> tuple[list[str], list[str]]:
    """(input paths, output paths), 1:1 — semantics of outputs.rs:211-309."""
    inputs = spec.inputs if spec.inputs is not None else [os.getcwd()]
    in_paths: list[str] = []
    out_paths: list[str] = []
    for input_path in inputs:
        if os.path.isfile(input_path):
            # case 1: file input — tree flag is irrelevant
            in_paths.append(input_path)
            out_paths.append(
                convert_file_path(
                    input_path, spec.output_dir, spec.file_prefix, spec.file_postfix
                )
            )
        elif os.path.isdir(input_path):
            if not spec.tree:
                # case 2: directory, non-tree — flat mapping
                for sub in _dir_tabular_files(input_path, tree=False):
                    in_paths.append(sub)
                    out_paths.append(
                        convert_file_path(
                            sub, spec.output_dir, spec.file_prefix, spec.file_postfix
                        )
                    )
            else:
                # case 3: directory, tree — re-root relative subpaths
                for sub in _dir_tabular_files(input_path, tree=True):
                    if spec.output_dir is not None:
                        rel = os.path.relpath(sub, input_path)
                        new_path = os.path.join(spec.output_dir, rel)
                    else:
                        new_path = sub
                    in_paths.append(sub)
                    out_paths.append(
                        convert_file_path(
                            new_path, None, spec.file_prefix, spec.file_postfix
                        )
                    )
        else:
            raise OutputPathError(f"input path does not exist: {input_path}")

    if spec.sort:
        paired = sorted(zip(in_paths, out_paths), key=lambda io: io[1])
        in_paths = [i for i, _ in paired]
        out_paths = [o for _, o in paired]

    seen: set[str] = set()
    for o in out_paths:
        if o in seen:
            raise OutputPathError(f"Duplicate output path: {o}")
        seen.add(o)
    return in_paths, out_paths
