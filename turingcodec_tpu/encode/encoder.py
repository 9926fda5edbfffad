"""Encoder facade: configuration -> parameter sets, frame loop, NAL/AU
assembly. Parity reference: turing/Encoder.cpp (setupSps/Pps/Vps 576-973,
encodePicture 422), turing/TaskEncodeOutput.cpp (AU assembly).

Round-1 scope: all-intra, fixed QP, IDR-only, single slice, no WPP.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from turingcodec_tpu.bitstream.writer import BitWriter, wrap_nal
from turingcodec_tpu.hevc import types as T
from turingcodec_tpu.hevc.geometry import PictureGeometry
from turingcodec_tpu.hevc.header_syntax import (
    write_pps,
    write_slice_segment_header,
    write_sps,
    write_vps,
)
from turingcodec_tpu.hevc.params import (
    Pps,
    ProfileTierLevel,
    SliceSegmentHeader,
    Sps,
    Vps,
)
from turingcodec_tpu.encode.ctu_write import write_slice_data
from turingcodec_tpu.encode.intra_search import IntraPictureEncoder
from turingcodec_tpu.decode.picture_recon import PictureReconstructor


@dataclass
class EncoderConfig:
    width: int = 640
    height: int = 360
    qp: int = 26
    bit_depth: int = 8
    ctb_log2: int = 6
    min_cb_log2: int = 3
    rd_candidates: int = 3
    max_cu_log2: int = 5
    intra_period: int = 0   # 0 = only first frame is IDR (low-delay P)
    all_intra: bool = False
    search_range: int = 48
    verify_recon: bool = True  # assert search recon == plan-replay recon


class Encoder:
    def __init__(self, cfg: EncoderConfig):
        assert cfg.width % 8 == 0 and cfg.height % 8 == 0, \
            "conformance cropping not implemented: use multiple-of-8 sizes"
        self.cfg = cfg
        self.sps = self._setup_sps()
        self.pps = self._setup_pps()
        self.vps = self._setup_vps()
        self.geom = PictureGeometry(self.sps, self.pps)
        self.frame_count = 0
        self._poc = 0
        self._prev_ref = None

    # ------------------------------------------------------------------
    def _setup_ptl(self) -> ProfileTierLevel:
        p = ProfileTierLevel()
        p.general_profile_idc = 1  # Main
        p.general_profile_compatibility_flags = 1 << (31 - 1)
        p.general_progressive_source_flag = 1
        p.general_frame_only_constraint_flag = 1
        p.general_level_idc = 120  # level 4.0
        return p

    def _setup_sps(self) -> Sps:
        c = self.cfg
        s = Sps()
        s.ptl = self._setup_ptl()
        s.chroma_format_idc = 1
        s.pic_width_in_luma_samples = c.width
        s.pic_height_in_luma_samples = c.height
        s.bit_depth_luma_minus8 = c.bit_depth - 8
        s.bit_depth_chroma_minus8 = c.bit_depth - 8
        s.log2_max_pic_order_cnt_lsb_minus4 = 4
        s.sps_max_dec_pic_buffering_minus1 = [1]
        s.sps_max_num_reorder_pics = [0]
        s.sps_max_latency_increase_plus1 = [0]
        s.log2_min_luma_coding_block_size_minus3 = c.min_cb_log2 - 3
        s.log2_diff_max_min_luma_coding_block_size = c.ctb_log2 - c.min_cb_log2
        s.log2_min_luma_transform_block_size_minus2 = 0
        s.log2_diff_max_min_luma_transform_block_size = 3  # 4..32
        s.max_transform_hierarchy_depth_inter = 0
        s.max_transform_hierarchy_depth_intra = 0
        s.scaling_list_enabled_flag = 0
        s.amp_enabled_flag = 0
        s.sample_adaptive_offset_enabled_flag = 0
        s.pcm_enabled_flag = 0
        s.short_term_rps = []
        s.long_term_ref_pics_present_flag = 0
        s.sps_temporal_mvp_enabled_flag = 0
        s.strong_intra_smoothing_enabled_flag = 1
        if not self.cfg.all_intra:
            s.sps_max_dec_pic_buffering_minus1 = [2]
        return s

    def _setup_pps(self) -> Pps:
        c = self.cfg
        p = Pps()
        p.init_qp_minus26 = c.qp - 26
        p.sign_data_hiding_enabled_flag = 0
        p.entropy_coding_sync_enabled_flag = 0
        p.cu_qp_delta_enabled_flag = 0
        p.transform_skip_enabled_flag = 0
        p.loop_filter_across_tiles_enabled_flag = 1
        return p

    def _setup_vps(self) -> Vps:
        v = Vps()
        v.ptl = self._setup_ptl()
        v.vps_max_dec_pic_buffering_minus1 = [1]
        v.vps_max_num_reorder_pics = [0]
        v.vps_max_latency_increase_plus1 = [0]
        return v

    # ------------------------------------------------------------------
    def headers(self) -> bytes:
        out = b""
        bw = BitWriter()
        write_vps(bw, self.vps)
        out += wrap_nal(T.NalUnitType.VPS_NUT, bw.get_bytes())
        bw = BitWriter()
        write_sps(bw, self.sps)
        out += wrap_nal(T.NalUnitType.SPS_NUT, bw.get_bytes())
        bw = BitWriter()
        write_pps(bw, self.pps)
        out += wrap_nal(T.NalUnitType.PPS_NUT, bw.get_bytes())
        return out

    def _slice_header(self, is_idr: bool, poc: int) -> SliceSegmentHeader:
        from turingcodec_tpu.hevc.params import ShortTermRefPicSet

        sh = SliceSegmentHeader()
        sh.first_slice_segment_in_pic_flag = 1
        sh.slice_qp_delta = 0
        sh.slice_qp_y = 26 + self.pps.init_qp_minus26
        sh.slice_sao_luma_flag = 0
        sh.slice_sao_chroma_flag = 0
        sh.slice_deblocking_filter_disabled_flag = 0
        sh.num_entry_point_offsets = 0
        if is_idr:
            sh.nal_unit_type = T.NalUnitType.IDR_W_RADL
            sh.slice_type = 2
        else:
            sh.nal_unit_type = T.NalUnitType.TRAIL_R
            sh.slice_type = 1  # P
            sh.slice_pic_order_cnt_lsb = poc % self.sps.max_pic_order_cnt_lsb
            sh.short_term_ref_pic_set_sps_flag = 0
            sh.explicit_rps = ShortTermRefPicSet(
                delta_poc_s0=[-1], used_s0=[1])
            sh.num_ref_idx_l0_active_minus1 = \
                self.pps.num_ref_idx_l0_default_active_minus1
            sh.five_minus_max_num_merge_cand = 0
            sh.max_num_merge_cand = 5
        return sh

    # ------------------------------------------------------------------
    def encode_frame(self, yuv: List[np.ndarray]) -> tuple:
        """Encode one frame; returns (nal_bytes, recon_planes)."""
        from turingcodec_tpu.decode.dpb import DecodedPicture
        from turingcodec_tpu.encode.inter_search import InterPictureEncoder

        idx = self.frame_count
        if self.cfg.all_intra:
            is_idr = True
        elif self.cfg.intra_period:
            is_idr = (idx % self.cfg.intra_period) == 0
        else:
            is_idr = idx == 0
        if is_idr:
            self._poc = 0
            self._prev_ref = None
        poc = self._poc
        sh = self._slice_header(is_idr, poc)
        if is_idr or self._prev_ref is None:
            enc = IntraPictureEncoder(self.sps, self.pps, sh, self.geom,
                                      rd_candidates=self.cfg.rd_candidates,
                                      max_cu_log2=self.cfg.max_cu_log2)
        else:
            enc = InterPictureEncoder(
                self.sps, self.pps, sh, self.geom,
                [[self._prev_ref], []], poc,
                rd_candidates=self.cfg.rd_candidates,
                max_cu_log2=self.cfg.max_cu_log2,
                search_range=self.cfg.search_range)
        plan, search_recon = enc.encode_picture(yuv)

        # bitstream: slice header + CABAC slice data
        bw = BitWriter()
        write_slice_segment_header(bw, sh, self.sps, self.pps)
        substreams = write_slice_data(plan, self.geom, sh, 0)
        assert len(substreams) == 1
        rbsp = bw.get_bytes() + substreams[0]
        nal = wrap_nal(sh.nal_unit_type, rbsp)

        # reconstruction: the search recon (pre-filter) + the decoder's own
        # deblocking over the same plan tensors. Bit-exact agreement with an
        # actual decode of the written bitstream is asserted by the
        # round-trip tests (the signature.cpp:171-177 invariant).
        from turingcodec_tpu.decode.deblock import deblock_picture
        from turingcodec_tpu.decode.dpb import DecodedPicture
        recon = [p.copy() for p in search_recon]
        deblock_picture(plan, self.geom, recon[0], recon[1], recon[2])
        ref = DecodedPicture(poc=poc)
        ref.planes = recon
        ref.plan = plan
        self._prev_ref = ref
        self._poc = poc + 1
        self.frame_count += 1
        self._last_plan = plan
        return nal, recon


def encode_yuv_stream(yuv_bytes: bytes, cfg: EncoderConfig,
                      n_frames: Optional[int] = None) -> tuple:
    """Encode raw 4:2:0 YUV; returns (bitstream bytes, recon md5 hex)."""
    w, h = cfg.width, cfg.height
    fsz = w * h * 3 // 2
    total = len(yuv_bytes) // fsz
    if n_frames is not None:
        total = min(total, n_frames)
    enc = Encoder(cfg)
    out = [enc.headers()]
    md5 = hashlib.md5()
    for i in range(total):
        off = i * fsz
        y = np.frombuffer(yuv_bytes[off:off + w * h],
                          np.uint8).reshape(h, w).astype(np.int16)
        cb = np.frombuffer(yuv_bytes[off + w * h:off + w * h + w * h // 4],
                           np.uint8).reshape(h // 2, w // 2).astype(np.int16)
        cr = np.frombuffer(
            yuv_bytes[off + w * h + w * h // 4:off + fsz],
            np.uint8).reshape(h // 2, w // 2).astype(np.int16)
        nal, recon = enc.encode_frame([y, cb, cr])
        out.append(nal)
        for p in recon:
            md5.update(p.astype(np.uint8).tobytes())
    return b"".join(out), md5.hexdigest()
