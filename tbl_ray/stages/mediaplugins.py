"""Pluggable media-codec seam (external decoder bindings).

The built-in pure-numpy codecs cover BMP / PNG (incl. Adam7) / baseline
and progressive JPEG images and RIFF/PCM16 WAV audio — real decodes with
no external libraries. Web corpora also carry MP3/AAC audio and
H.264/VP9 video, which this environment cannot decode from first
principles: their specs normatively depend on large published table data
(the 512-entry MPEG-1 synthesis window, the Layer II/III allocation and
Huffman tables, H.264's CABAC context tables) that cannot be re-derived
offline, and shipping an approximation would decode only its own output.
Production deployments bind libmpg123 / pyav / libjpeg-turbo instead —
this module is the seam those bindings plug into WITHOUT forking the
decode stages (`SURVEY.md §8.5`; reference parity n/a — the reference
is tabular-only).

A decoder is a :class:`MediaDecoder` ``(name, kind, sniff, decode)``:

- ``kind``: ``"image"`` | ``"audio"`` | ``"video"``;
- ``sniff(payload: bytes, mime: str | None) -> bool`` — cheap header
  test, must not raise on arbitrary bytes;
- ``decode(payload: bytes)`` returns pixels ``(H, W, C) uint8`` (image),
  ``(samples int16 (n, ch), rate)`` (audio), or ``list[bytes]`` of
  independently decodable frame images (video); raises ``ValueError``
  for corrupt input, which funnels into the stage's ``on_error`` policy.

Resolution order: registered/plugin decoders FIRST (so a libjpeg-turbo
binding can take over JPEG from the numpy codec), built-ins last.
Decoder lists resolve ON THE DRIVER at stage construction and ship to
actors via constructor arguments — worker processes never re-read env
vars or re-import plugin modules, so a heterogeneous cluster cannot
split-brain on codec availability.

``TBL_RAY_MEDIA_PLUGINS=pkg.mod1,pkg.mod2`` names importable modules,
each exposing ``MEDIA_DECODERS: list[MediaDecoder]``. Import failures
RAISE at stage construction (a silently missing codec would corrupt a
100 TB decode run with fake/null rows); use
:func:`register_media_decoder` for programmatic registration.

The checksum fake is NOT a decoder and cannot be registered as one: it
exists only behind the stages' ``on_error="fake"`` policy, quarantined
from every real decode path.

Serialization contract: decoder callables ship to Ray actors inside
constructor arguments, so they must either live in a module importable
on every worker (site-packages) or pickle BY VALUE — closures,
``__main__`` functions, or functions from a module registered with
``cloudpickle.register_pickle_by_value``. A top-level function from a
driver-only module pickles by reference and kills the actor constructor
in a restart loop.
"""

from __future__ import annotations

import importlib
import os
from dataclasses import dataclass
from typing import Callable

KINDS = ("image", "audio", "video")


@dataclass(frozen=True)
class MediaDecoder:
    name: str
    kind: str
    sniff: Callable[[bytes, "str | None"], bool]
    decode: Callable[[bytes], object]

    def __post_init__(self):
        if self.kind not in KINDS:
            raise ValueError(f"kind must be one of {KINDS}, got {self.kind!r}")


_REGISTRY: list[MediaDecoder] = []


def register_media_decoder(dec: MediaDecoder, *, replace: bool = False) -> None:
    """Register a decoder (driver-side; takes effect for stages built
    afterwards). ``replace=True`` swaps an existing same-name entry."""
    if not isinstance(dec, MediaDecoder):
        raise TypeError("register_media_decoder takes a MediaDecoder")
    existing = [d for d in _REGISTRY if d.name == dec.name]
    if existing and not replace:
        raise ValueError(
            f"media decoder {dec.name!r} already registered (replace=True to swap)"
        )
    for d in existing:
        _REGISTRY.remove(d)
    _REGISTRY.append(dec)


def unregister_media_decoder(name: str) -> bool:
    """Remove a registered decoder; returns whether it existed."""
    before = len(_REGISTRY)
    _REGISTRY[:] = [d for d in _REGISTRY if d.name != name]
    return len(_REGISTRY) != before


def _plugin_decoders() -> list[MediaDecoder]:
    mods = os.environ.get("TBL_RAY_MEDIA_PLUGINS", "")
    out: list[MediaDecoder] = []
    for name in filter(None, (m.strip() for m in mods.split(","))):
        mod = importlib.import_module(name)  # failures raise, by design
        decs = getattr(mod, "MEDIA_DECODERS", None)
        if not isinstance(decs, (list, tuple)):
            raise ValueError(
                f"plugin module {name!r} must expose MEDIA_DECODERS: "
                "list[MediaDecoder]"
            )
        out.extend(decs)
    return out


def registered_decoders(kind: str) -> list[MediaDecoder]:
    """Env plugins + programmatic registrations for ``kind``, in probe
    order (built-ins are appended by the stage layer —
    ``multimodal.resolve_media_decoders`` — which owns the numpy codecs;
    this module stays stdlib-only so the registry pickles cleanly into
    Ray workers). Call on the DRIVER."""
    if kind not in KINDS:
        raise ValueError(f"kind must be one of {KINDS}, got {kind!r}")
    chain = [d for d in _plugin_decoders() if d.kind == kind]
    chain += [d for d in _REGISTRY if d.kind == kind]
    return chain


def pick_decoder(
    decoders: list[MediaDecoder], data: bytes, mime: "str | None"
) -> MediaDecoder:
    """First decoder whose sniff accepts the payload, or ValueError (the
    stages' on_error funnel) naming the mime and the chain probed."""
    for d in decoders:
        if d.sniff(data, mime):
            return d
    raise ValueError(
        f"no registered decoder for payload (mime={mime!r}; probed "
        f"{[d.name for d in decoders]})"
    )
