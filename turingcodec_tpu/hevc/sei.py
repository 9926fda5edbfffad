"""SEI message framework (spec 7.3.5 / Annex D).

Parity reference: turing/SyntaxSei.h (payload dispatch), turing/sei/
decoded_picture_hash.h, TaskEncodeOutput.cpp:105-209 (encoder-side SEI).
Implemented payloads: decoded_picture_hash (md5/crc/checksum),
user_data_unregistered; unknown payloads are preserved as raw bytes.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from turingcodec_tpu.bitstream.reader import BitReader
from turingcodec_tpu.bitstream.writer import BitWriter, wrap_nal
from turingcodec_tpu.hevc import types as T

SEI_DECODED_PICTURE_HASH = 132
SEI_USER_DATA_UNREGISTERED = 5
SEI_ACTIVE_PARAMETER_SETS = 129
SEI_PIC_TIMING = 1
SEI_BUFFERING_PERIOD = 0


@dataclass
class SeiMessage:
    payload_type: int
    payload: bytes


def parse_sei_rbsp(rbsp: bytes) -> List[SeiMessage]:
    """sei_rbsp(): one or more sei_message()."""
    out = []
    br = BitReader(rbsp)
    while br.bits_left() > 8:
        ptype = 0
        while True:
            b = br.u(8)
            ptype += b
            if b != 0xFF:
                break
        psize = 0
        while True:
            b = br.u(8)
            psize += b
            if b != 0xFF:
                break
        payload = bytes(br.u(8) for _ in range(psize))
        out.append(SeiMessage(ptype, payload))
        if not br.more_rbsp_data():
            break
    return out


def write_sei_nal(messages: List[SeiMessage], suffix: bool = False,
                  temporal_id: int = 0) -> bytes:
    bw = BitWriter()
    for m in messages:
        t = m.payload_type
        while t >= 255:
            bw.u(0xFF, 8)
            t -= 255
        bw.u(t, 8)
        s = len(m.payload)
        while s >= 255:
            bw.u(0xFF, 8)
            s -= 255
        bw.u(s, 8)
        bw.write_bytes(m.payload)
    bw.rbsp_trailing_bits()
    nut = (T.NalUnitType.SUFFIX_SEI_NUT if suffix
           else T.NalUnitType.PREFIX_SEI_NUT)
    return wrap_nal(nut, bw.get_bytes(), temporal_id=temporal_id)


# ---------------------------------------------------------------- hashes

def _plane_bytes(plane: np.ndarray, bit_depth: int) -> bytes:
    if bit_depth <= 8:
        return plane.astype(np.uint8).tobytes()
    return plane.astype("<u2").tobytes()


def picture_md5(planes, bit_depth: int = 8) -> List[bytes]:
    return [hashlib.md5(_plane_bytes(p, bit_depth)).digest() for p in planes]


_CRC_TABLE = None


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tab = np.zeros(256, np.uint32)
        for b in range(256):
            crc = b << 8
            for _ in range(8):
                crc = ((crc << 1) ^ (0x1021 if crc & 0x8000 else 0)) & 0xFFFF
            tab[b] = crc
        _CRC_TABLE = tab
    return _CRC_TABLE


def picture_crc(planes, bit_depth: int = 8) -> List[int]:
    """Annex D.3.19 CRC-16 (x^16+x^12+x^5+1, init 0xFFFF).

    The spec feeds data bits into the LSB while reducing at the MSB, then
    shifts 16 trailing zero bits; per byte that is
    crc' = tab[crc >> 8] ^ ((crc & 0xFF) << 8) ^ byte.
    """
    tab = _crc_table()
    out = []
    for p in planes:
        data = np.frombuffer(_plane_bytes(p, bit_depth) + b"\x00\x00",
                             np.uint8)
        crc = 0xFFFF
        for byte in data.tolist():
            crc = (int(tab[crc >> 8]) ^ ((crc & 0xFF) << 8) ^ byte) & 0xFFFF
        out.append(crc)
    return out


def picture_checksum(planes, bit_depth: int = 8) -> List[int]:
    """Annex D.3.19 checksum (vectorized)."""
    out = []
    for p in planes:
        h, w = p.shape
        yy, xx = np.mgrid[0:h, 0:w]
        xor_mask = ((xx & 0xFF) ^ (yy & 0xFF) ^ (xx >> 8) ^ (yy >> 8)
                    ).astype(np.uint32)
        vals = p.astype(np.uint32)
        s = int(((vals & 0xFF) ^ xor_mask).sum(dtype=np.uint64))
        if bit_depth > 8:
            s += int((((vals >> 8) & 0xFF) ^ xor_mask).sum(dtype=np.uint64))
        out.append(s & 0xFFFFFFFF)
    return out


def make_decoded_picture_hash(planes, hash_type: int = 0,
                              bit_depth: int = 8) -> SeiMessage:
    bw = bytearray([hash_type])
    if hash_type == 0:
        for d in picture_md5(planes, bit_depth):
            bw.extend(d)
    elif hash_type == 1:
        for c in picture_crc(planes, bit_depth):
            bw.extend(c.to_bytes(2, "big"))
    else:
        for c in picture_checksum(planes, bit_depth):
            bw.extend(c.to_bytes(4, "big"))
    return SeiMessage(SEI_DECODED_PICTURE_HASH, bytes(bw))


def verify_decoded_picture_hash(msg: SeiMessage, planes,
                                bit_depth: int = 8) -> bool:
    want = make_decoded_picture_hash(planes, msg.payload[0], bit_depth)
    return want.payload == msg.payload


# ------------------------------------------------- structured payloads
# The payload set the reference encoder actively writes
# (TaskEncodeOutput.cpp:105-209): active_parameter_sets, pic_timing,
# user_data_unregistered, mastering_display_colour_volume,
# alternative_transfer_characteristics (+ decoded_picture_hash above).

SEI_MASTERING_DISPLAY = 137
SEI_ALTERNATIVE_TRANSFER = 147


def _finish_payload(bw: BitWriter) -> bytes:
    """SEI payload trailing bits (D.1): align with a 1 then 0s."""
    if bw.nbits:
        bw.u(1, 1)
        if bw.nbits:
            bw.u(0, 8 - bw.nbits)
    return bw.get_bytes()


def make_active_parameter_sets(vps_id: int = 0, sps_id: int = 0,
                               self_contained: int = 0,
                               no_update: int = 0) -> SeiMessage:
    """active_parameter_sets (D.2.21 / sei/active_parameter_sets.h)."""
    bw = BitWriter()
    bw.u(vps_id, 4)
    bw.u(self_contained, 1)
    bw.u(no_update, 1)
    bw.ue(0)  # num_sps_ids_minus1
    bw.ue(sps_id)
    return SeiMessage(SEI_ACTIVE_PARAMETER_SETS, _finish_payload(bw))


def parse_active_parameter_sets(payload: bytes) -> dict:
    br = BitReader(payload)
    return {"vps_id": br.u(4), "self_contained_cvs_flag": br.u(1),
            "no_parameter_set_update_flag": br.u(1),
            "sps_ids": [br.ue() for _ in range(br.ue() + 1)]}


def make_pic_timing(pic_struct=None, source_scan_type: int = 1,
                    duplicate_flag: int = 0, *,
                    au_cpb_removal_delay_minus1=None,
                    pic_dpb_output_delay: int = 0,
                    au_len: int = 24, dpb_len: int = 24) -> SeiMessage:
    """pic_timing (D.2.3 / D.3.3).

    The frame_field_info section (pic_struct/scan/duplicate) is written
    when pic_struct is not None (requires VUI frame_field_info=1); the
    CPB/DPB delay section when au_cpb_removal_delay_minus1 is not None
    (requires VUI HRD with nal/vcl hrd params — CpbDpbDelaysPresentFlag).
    au_len/dpb_len are (au_cpb_removal_delay_length_minus1 + 1) and
    (dpb_output_delay_length_minus1 + 1) from the active hrd_parameters.
    The reference emits only the frame_field part (sei/pic_timing.h);
    HRD timing is beyond-reference."""
    bw = BitWriter()
    if pic_struct is not None:
        bw.u(pic_struct, 4)
        bw.u(source_scan_type, 2)
        bw.u(duplicate_flag, 1)
    if au_cpb_removal_delay_minus1 is not None:
        bw.u(au_cpb_removal_delay_minus1, au_len)
        bw.u(pic_dpb_output_delay, dpb_len)
    return SeiMessage(SEI_PIC_TIMING, _finish_payload(bw))


def parse_pic_timing(payload: bytes, frame_field: bool = True,
                     cpb_dpb_delays: bool = False, au_len: int = 24,
                     dpb_len: int = 24) -> dict:
    br = BitReader(payload)
    out = {}
    if frame_field:
        out.update(pic_struct=br.u(4), source_scan_type=br.u(2),
                   duplicate_flag=br.u(1))
    if cpb_dpb_delays:
        out.update(au_cpb_removal_delay_minus1=br.u(au_len),
                   pic_dpb_output_delay=br.u(dpb_len))
    return out


def make_buffering_period(sps_id: int = 0, *,
                          nal_initial_cpb_removal_delay,
                          nal_initial_cpb_removal_offset,
                          concatenation_flag: int = 0,
                          au_cpb_removal_delay_delta_minus1: int = 0,
                          init_len: int = 24, au_len: int = 24
                          ) -> SeiMessage:
    """buffering_period (D.2.2 / D.3.2), NAL HRD single-sub-layer form
    (sub_pic_hrd off, irap_cpb_params off). The delay/offset lists carry
    one entry per CPB (CpbCnt); values in 90 kHz clock ticks. init_len is
    (initial_cpb_removal_delay_length_minus1 + 1). Beyond-reference: the
    reference encoder emits no buffering_period SEI."""
    bw = BitWriter()
    bw.ue(sps_id)
    bw.u(0, 1)  # irap_cpb_params_present_flag
    bw.u(concatenation_flag, 1)
    bw.u(au_cpb_removal_delay_delta_minus1, au_len)
    for d, o in zip(nal_initial_cpb_removal_delay,
                    nal_initial_cpb_removal_offset):
        bw.u(d, init_len)
        bw.u(o, init_len)
    return SeiMessage(SEI_BUFFERING_PERIOD, _finish_payload(bw))


def parse_buffering_period(payload: bytes, cpb_cnt: int = 1,
                           init_len: int = 24, au_len: int = 24) -> dict:
    br = BitReader(payload)
    out = {"bp_seq_parameter_set_id": br.ue(),
           "irap_cpb_params_present_flag": br.u(1)}
    if out["irap_cpb_params_present_flag"]:
        out["cpb_delay_offset"] = br.u(au_len)
        out["dpb_delay_offset"] = br.u(24)
    out["concatenation_flag"] = br.u(1)
    out["au_cpb_removal_delay_delta_minus1"] = br.u(au_len)
    out["nal_initial_cpb_removal_delay"] = []
    out["nal_initial_cpb_removal_offset"] = []
    for _ in range(cpb_cnt):
        out["nal_initial_cpb_removal_delay"].append(br.u(init_len))
        out["nal_initial_cpb_removal_offset"].append(br.u(init_len))
    return out


def make_user_data_unregistered(uuid: bytes, data: bytes) -> SeiMessage:
    """user_data_unregistered (D.2.7): 16-byte UUID + payload bytes."""
    assert len(uuid) == 16
    return SeiMessage(SEI_USER_DATA_UNREGISTERED, uuid + data)


def parse_user_data_unregistered(payload: bytes) -> dict:
    return {"uuid": payload[:16], "data": payload[16:]}


def make_mastering_display(primaries, white_point, max_luminance: int,
                           min_luminance: int) -> SeiMessage:
    """mastering_display_colour_volume (D.2.28): primaries/white point in
    0.00002 units, luminance in 0.0001 cd/m2 units."""
    bw = BitWriter()
    for (x, y) in primaries:
        bw.u(x, 16)
        bw.u(y, 16)
    bw.u(white_point[0], 16)
    bw.u(white_point[1], 16)
    bw.u(max_luminance, 32)
    bw.u(min_luminance, 32)
    return SeiMessage(SEI_MASTERING_DISPLAY, _finish_payload(bw))


def parse_mastering_display(payload: bytes) -> dict:
    br = BitReader(payload)
    prim = [(br.u(16), br.u(16)) for _ in range(3)]
    return {"primaries": prim, "white_point": (br.u(16), br.u(16)),
            "max_luminance": br.u(32), "min_luminance": br.u(32)}


def make_alternative_transfer_characteristics(tc: int) -> SeiMessage:
    """alternative_transfer_characteristics (D.2.38)."""
    bw = BitWriter()
    bw.u(tc, 8)
    return SeiMessage(SEI_ALTERNATIVE_TRANSFER, _finish_payload(bw))


def parse_alternative_transfer_characteristics(payload: bytes) -> dict:
    return {"preferred_transfer_characteristics": payload[0]}


_STRUCTURED_PARSERS = {
    SEI_ACTIVE_PARAMETER_SETS: parse_active_parameter_sets,
    SEI_PIC_TIMING: parse_pic_timing,
    SEI_USER_DATA_UNREGISTERED: parse_user_data_unregistered,
    SEI_MASTERING_DISPLAY: parse_mastering_display,
    SEI_ALTERNATIVE_TRANSFER: parse_alternative_transfer_characteristics,
}


def parse_structured(msg: SeiMessage):
    """Structured view of a known payload, or None."""
    fn = _STRUCTURED_PARSERS.get(msg.payload_type)
    try:
        return fn(msg.payload) if fn else None
    except (EOFError, IndexError):
        return None
