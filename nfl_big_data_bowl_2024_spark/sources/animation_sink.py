"""S5b — animation/GIF sink (reference optimal_pursuit.py:406-428, where the
per-frame play animation is assembled with ``imageio.mimsave``).

Engine-side contract mirrors the figure sink: the PLAN produces a bounded
per-frame table (e.g. ``single_play_trajectory``: one row per frameId with
carrier/tackler positions), the driver pulls it and renders. This container
has no image codecs (no imageio/PIL/matplotlib), so the writer is a
self-contained GIF89a encoder — indexed frames, standard LZW compression,
Netscape looping extension — written from the public GIF89a specification.
Frames are rasterized straight to palette indices (no quantization step).
"""

from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import DataFrame

MAX_ANIMATION_ROWS = 10_000

# Fixed 16-color palette; frames are drawn AS palette indices.
PALETTE = [
    (255, 255, 255),  # 0 background
    (34, 120, 52),    # 1 field green
    (200, 220, 205),  # 2 gridline
    (20, 60, 160),    # 3 carrier
    (180, 30, 30),    # 4 tackler
    (120, 160, 220),  # 5 carrier trail
    (230, 160, 150),  # 6 tackler trail
    (240, 200, 40),   # 7 vicinity highlight
    (0, 0, 0),        # 8 border
    (90, 90, 90),     # 9
    (150, 150, 150),  # 10
    (60, 140, 200),   # 11
    (220, 120, 40),   # 12
    (130, 60, 160),   # 13
    (40, 40, 40),     # 14
    (250, 240, 220),  # 15
]


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits a code stream (clear-code initialised, table
    reset at 4096 entries) packed LSB-first."""
    clear_code = 1 << min_code_size
    end_code = clear_code + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear_code)}
    next_code = end_code + 1

    emit(clear_code)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # The decoder lags one entry behind and bumps its read size
            # after filling slot (1<<cs)-1; mirror that exactly.
            if next_code > (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            # Table full (slot 4095 assigned): emit CLEAR at the current
            # 12-bit size, then reset both table and code size.
            emit(clear_code)
            table = {bytes([i]): i for i in range(clear_code)}
            next_code = end_code + 1
            code_size = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix])
    emit(end_code)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def write_gif(
    frames: list[np.ndarray],
    path: str,
    fps: float = 10.0,
    palette: list[tuple[int, int, int]] = PALETTE,
    loop: int = 0,
) -> str:
    """Write (H, W) uint8 palette-index frames as an animated GIF89a."""
    if not frames:
        raise ValueError("write_gif needs at least one frame")
    h, w = frames[0].shape
    n_colors = len(palette)
    # GCT size must be a power of two >= n_colors, minimum 2 bits here.
    gct_bits = max(2, (n_colors - 1).bit_length())
    min_code_size = gct_bits
    delay_cs = max(1, round(100.0 / fps))  # GIF delay is in 1/100 s

    buf = bytearray()
    buf += b"GIF89a"
    buf += struct.pack("<HH", w, h)
    buf.append(0x80 | ((gct_bits - 1) << 4) | (gct_bits - 1))  # GCT present
    buf += b"\x00\x00"  # bg color index, aspect
    for i in range(1 << gct_bits):
        r, g, b = palette[i] if i < n_colors else (0, 0, 0)
        buf += bytes((r, g, b))
    # Netscape looping extension (loop=0 -> forever).
    buf += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"

    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share one shape")
        buf += b"\x21\xf9\x04" + bytes((0x04, delay_cs & 0xFF, delay_cs >> 8, 0, 0))
        buf += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        buf.append(min_code_size)
        buf += _sub_blocks(
            _lzw_encode(fr.astype(np.uint8).tobytes(), min_code_size)
        )
    buf += b"\x3b"

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(buf))
    return path


def _dot(canvas: np.ndarray, px: int, py: int, r: int, color: int):
    h, w = canvas.shape
    canvas[max(0, py - r) : min(h, py + r + 1), max(0, px - r) : min(w, px + r + 1)] = color


def _edged_dots(canvas: np.ndarray, dots: list[tuple[int, int, int, int]]):
    """Filled square markers with 1-px black edges — the reference's
    ``markeredgecolor='k'`` club markers (optimal_pursuit.py:376-378).
    ALL edges paint before ANY fill so overlapping markers (carrier and
    tackler inside the vicinity radius) occlude each other's edges, not
    each other's fills."""
    for px, py, r, _ in dots:
        _dot(canvas, px, py, r + 1, 8)
    for px, py, r, color in dots:
        _dot(canvas, px, py, r, color)


def _arrow(canvas: np.ndarray, px: int, py: int, dir_deg: float, color: int,
           length: int = 7):
    """Orientation arrow from a compass heading (0 = +y, clockwise) — the
    reference's quiver of (sin th, cos th) unit vectors
    (optimal_pursuit.py:379,419-421). Raster y grows DOWN, so the y
    component negates."""
    if dir_deg is None or dir_deg != dir_deg:  # NaN heading: no arrow
        return
    th = np.radians(dir_deg)
    ux, uy = np.sin(th), -np.cos(th)
    for step in range(1, length + 1):
        _dot(canvas, int(round(px + ux * step)), int(round(py + uy * step)),
             0, color)


# NFL hash marks sit 70'9" from each sideline (the two y ticks the
# reference pins at (70+3/4)*(1/3) and 53.3 minus that,
# optimal_pursuit.py:372).
_HASH_Y = (70.0 + 3.0 / 4.0) * (1.0 / 3.0)


def rasterize_play_frames(
    pdf,
    scale: float = 3.0,
    field_x: float = 120.0,
    field_y: float = 53.3,
) -> list[np.ndarray]:
    """Per-frame palette-index rasters from a ``single_play_trajectory``-shaped
    pandas frame (frameId, cx, cy, tx, ty, in_vicinity [, cdir, tdir]).

    Field-marking parity with the reference plot (optimal_pursuit.py:
    367-380): 5-yd minor / 10-yd major yard lines, the two hash-mark rows
    at 70'9" from each sideline, sideline border; club-colored square
    markers with black edges; orientation arrows from the compass
    headings when ``cdir``/``tdir`` columns are present; prefix-path
    trails; vicinity highlight ring."""
    pdf = pdf.sort_values("frameId").reset_index(drop=True)
    w, h = int(field_x * scale) + 1, int(field_y * scale) + 1

    def to_px(x, y):
        return (
            int(round(min(max(x, 0.0), field_x) * scale)),
            int(round((field_y - min(max(y, 0.0), field_y)) * scale)),
        )

    base = np.full((h, w), 1, dtype=np.uint8)  # field green
    for five in range(0, int(field_x) + 1, 5):  # 5-yd minor yard lines
        base[:: 2, int(five * scale)] = 2
    for ten in range(0, int(field_x) + 1, 10):  # 10-yd major yard lines
        base[:, int(ten * scale)] = 2
    for hy in (_HASH_Y, field_y - _HASH_Y):  # hash-mark rows, 1-yd ticks
        py = int(round((field_y - hy) * scale))
        for yard in range(10, int(field_x) - 9):
            base[py, int(yard * scale)] = 2
    base[0, :] = 8
    base[-1, :] = 8
    base[:, 0] = 8
    base[:, -1] = 8

    has_dirs = "cdir" in pdf.columns and "tdir" in pdf.columns
    frames = []
    for i in range(len(pdf)):
        canvas = base.copy()
        for j in range(i):  # trails
            cpx, cpy = to_px(pdf.loc[j, "cx"], pdf.loc[j, "cy"])
            tpx, tpy = to_px(pdf.loc[j, "tx"], pdf.loc[j, "ty"])
            _dot(canvas, cpx, cpy, 0, 5)
            _dot(canvas, tpx, tpy, 0, 6)
        row = pdf.loc[i]
        cpx, cpy = to_px(row["cx"], row["cy"])
        tpx, tpy = to_px(row["tx"], row["ty"])
        if "in_vicinity" in pdf.columns and row["in_vicinity"]:
            _dot(canvas, cpx, cpy, 4, 7)
        if has_dirs:
            _arrow(canvas, cpx, cpy, row["cdir"], 14)
            _arrow(canvas, tpx, tpy, row["tdir"], 14)
        _edged_dots(canvas, [(cpx, cpy, 2, 3), (tpx, tpy, 2, 4)])
        frames.append(canvas)
    return frames


def save_animation(
    df: DataFrame,
    path: str,
    fps: float = 10.0,
    scale: float = 3.0,
) -> str:
    """Render a bounded per-frame trajectory DataFrame to ``path`` (.gif).

    Same contract as the figure sink: the plan must have reduced the data to
    a small per-frame table (one row per frame) before rendering — the
    reference renders exactly such per-play slices (optimal_pursuit.py:
    262-428), never raw season data.
    """
    pdf = df.limit(MAX_ANIMATION_ROWS + 1).toPandas()
    if len(pdf) > MAX_ANIMATION_ROWS:
        raise ValueError(
            f"animation sink got >{MAX_ANIMATION_ROWS} rows; reduce to one "
            "play's frames before animating"
        )
    if not path.endswith(".gif"):
        path = path + ".gif"
    return write_gif(rasterize_play_frames(pdf, scale=scale), path, fps=fps)
