"""Exercise the Pillow/PyAV PRODUCTION code paths with API-faithful
test doubles (r11 verdict #6: those branches had never executed in
this container — the optional deps aren't installed and installing is
out of scope). The doubles implement exactly the API surface the
backends consume (PIL.Image.open → size/convert/resize/getdata/save;
av.open → streams.video/decode/to_ndarray('rgb24').tobytes) on top of
the pure stdlib codecs, so every line of the `codec="pillow"` /
`codec="pyav"` branches runs and its output is compared EXACTLY to the
always-available pure lane (the normative feature/byte contract).

This proves the glue: dispatch, the call sequence, and the output
shaping. It cannot prove real-library pixel parity (resampling filters
differ) — that stays an optional-deps CI concern, documented in
BASELINE.md."""

from __future__ import annotations

import io

import pytest

from async_event_streams_spark.functions import codecs as C
from async_event_streams_spark.functions import multimodal as M


class _ShimPixels:
    """Minimal PIL.Image stand-in backed by the pure codec's integer
    math: convert('L') uses the same BT.601 fixed-point luma, resize is
    the same box average, save() is the same PNG filter-0 encoder."""

    def __init__(self, w: int, h: int, ch: int, pix: bytes):
        self.size = (w, h)
        self._w, self._h, self._ch, self._pix = w, h, ch, pix

    # context-manager protocol, like PIL.Image.open
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def convert(self, mode: str):
        if mode == "L":
            if self._ch == 1:
                return _ShimPixels(self._w, self._h, 1, self._pix)
            gray = bytes(
                C._luma(
                    self._pix[i], self._pix[i + 1], self._pix[i + 2]
                )
                for i in range(0, self._w * self._h * self._ch, self._ch)
            )
            return _ShimPixels(self._w, self._h, 1, gray)
        if mode == "RGB":
            rgb = C.box_resize_rgb(
                self._w, self._h, self._ch, self._pix, self._w, self._h
            )
            return _ShimPixels(self._w, self._h, 3, rgb)
        raise AssertionError(f"unexpected convert({mode!r})")

    def resize(self, wh: tuple[int, int]):
        tw, th = wh
        rgb = C.box_resize_rgb(
            self._w, self._h, self._ch, self._pix, tw, th
        )
        if self._ch == 1:
            # stay in L mode: box_resize broadcasts gray equally, so
            # channel 0 IS the box-averaged luma
            return _ShimPixels(tw, th, 1, bytes(rgb[0::3]))
        return _ShimPixels(tw, th, 3, bytes(rgb))

    def getdata(self):
        assert self._ch == 1, "getdata only used on L-mode thumbs"
        return list(self._pix)

    def save(self, buf: io.BytesIO, format: str):
        assert format == "PNG"
        assert self._ch == 3
        buf.write(C.png_encode(self._w, self._h, bytes(self._pix)))


class _ShimPIL:
    class Image:
        @staticmethod
        def open(buf: io.BytesIO):
            return _ShimPixels(*C.png_decode(buf.getvalue()))

    # multimodal uses `_PILImage.open(...)` where _PILImage is
    # `PIL.Image`, so expose open at this level too
    open = Image.open


class _ShimFrame:
    def __init__(self, rgb: bytes):
        self._rgb = rgb

    def to_ndarray(self, format: str):
        assert format == "rgb24"
        rgb = self._rgb

        class _ND:
            @staticmethod
            def tobytes() -> bytes:
                return rgb

        return _ND()


class _ShimContainer:
    def __init__(self, payload: bytes):
        self._payload = payload

        class _Streams:
            video = ["stream0"]

        self.streams = _Streams()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def decode(self, stream):
        assert stream == "stream0"
        for _i, _w, _h, rgb in C.y4m_frames(self._payload):
            yield _ShimFrame(rgb)


class _ShimAV:
    @staticmethod
    def open(buf: io.BytesIO):
        return _ShimContainer(buf.getvalue())


@pytest.fixture()
def png_payload() -> bytes:
    w, h = 19, 13  # deliberately non-multiple-of-4 box edges
    rgb = bytes(
        (x * 7 + y * 13 + c * 31) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    return C.png_encode(w, h, rgb)


def test_pillow_branch_decode_matches_pure(monkeypatch, png_payload):
    monkeypatch.setattr(M, "_PILImage", _ShimPIL)
    got = M.decode_image(png_payload, codec="pillow")
    want = M.decode_image(png_payload, codec="pure")
    assert got == want  # dims AND all 16 feature floats, exactly


def test_pillow_branch_resize_matches_pure(monkeypatch, png_payload):
    monkeypatch.setattr(M, "_PILImage", _ShimPIL)
    got = M.resize_payload(png_payload, 8, 6, codec="pillow")
    want = M.resize_payload(png_payload, 8, 6, codec="pure")
    assert got == want  # byte-identical PNG output
    # and the resized bytes decode to the target dimensions
    w, h, ch, _pix = C.png_decode(got)
    assert (w, h, ch) == (8, 6, 3)


def test_pillow_auto_dispatch_prefers_backend(monkeypatch):
    monkeypatch.setattr(M, "_PILImage", _ShimPIL)
    assert M._resolve_image_codec("auto") == "pillow"
    monkeypatch.setattr(M, "_PILImage", None)
    assert M._resolve_image_codec("auto") == "pure"
    with pytest.raises(NotImplementedError):
        M._resolve_image_codec("pillow")


def test_pyav_branch_matches_pure(monkeypatch):
    w, h = 6, 4
    frames = [bytes([(f * 29 + i) % 256 for i in range(w * h * 3)]) for f in range(7)]
    y4m = C.y4m_encode(w, h, frames)
    monkeypatch.setattr(M, "_av", _ShimAV)
    got = M.decode_video_frames(y4m, every_n=2, max_frames=3, codec="pyav")
    want = M.decode_video_frames(y4m, every_n=2, max_frames=3, codec="pure")
    assert got == want
    assert [i for i, _ in got] == [0, 2, 4]
    # the RGB->YUV->RGB roundtrip is lossy, so no original-bytes
    # equality — but each sampled frame must be a full RGB24 frame
    assert all(len(rgb) == w * h * 3 for _i, rgb in got)


def test_pyav_auto_dispatch(monkeypatch):
    monkeypatch.setattr(M, "_av", _ShimAV)
    assert M._resolve_video_codec("auto") == "pyav"
    monkeypatch.setattr(M, "_av", None)
    assert M._resolve_video_codec("auto") == "pure"
    with pytest.raises(NotImplementedError):
        M._resolve_video_codec("pyav")
