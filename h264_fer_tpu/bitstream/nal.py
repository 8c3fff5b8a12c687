"""Annex-B NAL unit framing (norm 7.3.1/B.1; reference nal.cpp).

Decode: scan for 4-byte start codes 00 00 00 01 (the reference requires the
4-byte form to *find* a NAL start, nal.cpp:86-98, but terminates a NAL at
either 00 00 00 or 00 00 01, nal.cpp:141-155), strip the one-byte header,
remove emulation-prevention 0x03 bytes (nal.cpp:208-224).

Encode: 4-byte start code + header byte + RBSP with 0x03 inserted before any
of {00,01,02,03} that follows two zero bytes (nal.cpp:261-299).
"""

from __future__ import annotations

from dataclasses import dataclass

# nal_unit_type values supported by the codec (h264_globals.h:82-86)
NAL_NOT_IDR = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8


@dataclass
class NalUnit:
    nal_ref_idc: int
    nal_unit_type: int
    rbsp: bytes


def remove_emulation_prevention(ebsp: bytes) -> bytes:
    """Strip 0x03 emulation-prevention bytes (7.3.1; nal.cpp:208-224)."""
    out = bytearray()
    i, n = 0, len(ebsp)
    while i < n:
        if i + 2 < n and ebsp[i] == 0 and ebsp[i + 1] == 0 and ebsp[i + 2] == 3:
            out.append(0)
            out.append(0)
            i += 3  # skip the emulation prevention byte
        else:
            out.append(ebsp[i])
            i += 1
    return bytes(out)


def insert_emulation_prevention(rbsp: bytes) -> bytes:
    """Insert 0x03 before {00,01,02,03} following two zeros (nal.cpp:272-295).

    Uses the native extension when available (bit-identical; fuzz-tested).
    """
    try:
        from ..native import insert_epb_native

        out_n = insert_epb_native(rbsp)
        if out_n is not None:
            return out_n
    except Exception:
        pass
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def iter_nal_units(stream: bytes):
    """Yield NalUnit for each Annex-B NAL in `stream`.

    Matches the reference scanner: starts are the 4-byte code only; a NAL
    ends at the next 00 00 0{0,1} or end of stream.
    """
    pos = 0
    n = len(stream)
    while True:
        start = stream.find(b"\x00\x00\x00\x01", pos)
        if start < 0:
            return
        start += 4
        # find end: next 00 00 00 or 00 00 01
        end = n
        j = start
        while j + 2 < n:
            if stream[j] == 0 and stream[j + 1] == 0 and stream[j + 2] <= 1:
                end = j
                break
            j += 1
        header = stream[start]
        yield NalUnit(
            nal_ref_idc=(header >> 5) & 3,
            nal_unit_type=header & 0x1F,
            rbsp=remove_emulation_prevention(stream[start + 1 : end]),
        )
        pos = end


def write_nal_unit(nal_ref_idc: int, nal_unit_type: int, rbsp: bytes) -> bytes:
    header = ((nal_ref_idc & 3) << 5) | (nal_unit_type & 0x1F)
    return b"\x00\x00\x00\x01" + bytes([header]) + insert_emulation_prevention(rbsp)
