"""All-Intra encoder driver: frames → Annex-B bitstream + reconstruction.

TPU-native analog of the reference's encoder stack
(`/root/reference/source/Lib/EncoderLib/EncLib.cpp` → EncLib::encode;
EncGOP.cpp → compressGOP (AI degenerate case); EncSlice.cpp →
compressSlice/encodeSlice; SEIEncoder.cpp → initDecodedPictureHashSEI +
libmd5).  Phases per picture (SURVEY.md §7.2 S2/S6):

  1. batched RDO on device (vvc.enc.rdo) → partition + modes
  2. per tile (PPS tile columns — the primary spatial shard axis,
     SURVEY.md §2.7 P-3): sequential reconstruction (vvc.model.recon,
     shared with the decoder) + host CABAC entropy into an independent
     substream.  Tiles cut all prediction/entropy dependencies, so both
     run concurrently across a thread pool (the native cores release the
     GIL); substreams are glued with entry-point offsets like the
     reference's tile bitstream layout.
  3. NAL framing (SPS/PPS/IDR slices + decoded-picture-hash SEI)
"""
from __future__ import annotations

import concurrent.futures
import hashlib

import numpy as np

from vvc.common.types import NalUnitType, SliceType
from vvc.io.nal import NalUnit, write_annexb
from vvc.io.yuv import Frame, psnr
from vvc.hls.ps import SPS, PPS, SliceHeader
from vvc.hls.write import write_sps, write_pps, write_slice_header
from vvc.cabac.engine import BinEncoder
from vvc.packer import native as native_packer
from vvc.cabac.ctx import SliceContexts
from vvc.cabac.cu_syntax import TreeWriter
from vvc.model.frame import CodingState
from vvc.model.recon import reconstruct_leaves
from vvc.enc.rdo import rdo_partition, rdo_partition_frames

SEI_PIC_HASH_MD5 = 132  # decoded_picture_hash payload type

# native C++ tree-syntax writer for intra slices (byte-equal to the Python
# TreeWriter — tests flip this to compare streams)
USE_NATIVE_TREE = True


def _hash_sei_payload(planes, bit_depth: int = 8) -> bytes:
    out = bytearray([SEI_PIC_HASH_MD5])
    body = bytearray([0])  # hash_type 0 = MD5
    dt = np.uint8 if bit_depth == 8 else np.dtype("<u2")
    for p in planes:
        body += hashlib.md5(np.ascontiguousarray(p.astype(dt)).tobytes()).digest()
    out.append(len(body))
    out += body
    out += b"\x80"  # rbsp trailing
    return bytes(out)


def _decide_chroma_modes(leaves, frame, bit_depth: int):
    """Per-leaf DM-vs-CCLM decision on *original* samples (the same
    approximation the RDO search uses; reconstruction then executes the
    chosen mode exactly).  Reference: IntraSearch::estIntraPredChromaQT.

    DM costs come from one batched 67-mode prediction per (size, plane)
    group (vvc.kernels.intra); CCLM costs from the vectorized model."""
    from vvc.kernels.cclm import luma_ds_plane
    from vvc.kernels.intra import predict_modes_np, build_ref_lines_orig_np

    ds = luma_ds_plane(frame.y)
    by_size = {}
    for i, leaf in enumerate(leaves):
        by_size.setdefault(leaf.size >> 1, []).append(i)
    by_size = {k: np.asarray(v) for k, v in by_size.items()}
    cost_dm = np.zeros(len(leaves))
    cost_lm = {v: np.zeros(len(leaves)) for v in (1, 2, 3)}
    from vvc.kernels.cclm import derive_models_batch

    for cs, idxs in by_size.items():
        xs = np.array([leaves[i].x0 >> 1 for i in idxs], dtype=np.int32)
        ys = np.array([leaves[i].y0 >> 1 for i in idxs], dtype=np.int32)
        modes = np.array([leaves[i].luma_mode for i in idxs])
        modes = np.where(modes >= 67, 0, modes)  # MIP leaves: DM = planar
        oy = np.arange(cs)
        # batched block extraction [N, cs, cs]
        ds_blocks = ds[ys[:, None, None] + oy[None, :, None],
                       xs[:, None, None] + oy[None, None, :]].astype(np.int64)
        for plane in (frame.cb, frame.cr):
            refs = build_ref_lines_orig_np(plane, xs, ys, cs, bit_depth)
            pdm = predict_modes_np(refs, modes, cs, bit_depth)
            obs = plane[ys[:, None, None] + oy[None, :, None],
                        xs[:, None, None] + oy[None, None, :]].astype(np.int64)
            cost_dm[idxs] += ((obs - pdm) ** 2).sum(axis=(1, 2))
            for v in (1, 2, 3):   # LM, LM_L, LM_T
                ab = derive_models_batch(ds, plane, xs, ys, cs, bit_depth,
                                         variant=v)
                plm = (((ab[:, 0:1, None] * ds_blocks) >> 13)
                       + ab[:, 1:2, None])
                plm = np.clip(plm, 0, (1 << bit_depth) - 1)
                cost_lm[v][idxs] += ((obs - plm) ** 2).sum(axis=(1, 2))
    for i, leaf in enumerate(leaves):
        costs = [cost_dm[i], cost_lm[1][i], cost_lm[2][i], cost_lm[3][i]]
        leaf.chroma_mode = int(np.argmin(costs))


def tile_columns(num_cols: int, width: int, ctu_size: int):
    """Uniform tile column bounds in luma samples (reference: PPS::initTiles
    uniform spacing).  Returns [(x0, x1), ...]."""
    n_ctu = (width + ctu_size - 1) // ctu_size
    bounds = [(i * n_ctu) // num_cols * ctu_size for i in range(num_cols)]
    bounds.append(width)
    return [(bounds[i], min(bounds[i + 1], width)) for i in range(num_cols)
            if bounds[i] < width]


def tile_grid(num_cols: int, num_rows: int, width: int, height: int,
              ctu_size: int):
    """Uniform tile grid, raster order (reference: PPS::initTiles rows ×
    columns).  Returns [(x0, x1, y0, y1), ...]."""
    cols = tile_columns(num_cols, width, ctu_size)
    rows = tile_columns(num_rows, height, ctu_size)
    return [(tx0, tx1, ty0, ty1) for ty0, ty1 in rows
            for tx0, tx1 in cols]


class Encoder:
    def __init__(self, sps: SPS, pps: PPS, parallel_tiles: bool = True):
        self.sps = sps
        self.pps = pps
        self.parallel_tiles = parallel_tiles

    def _recon_tile(self, frame, recon, leaves_t, qp, refs=None,
                    inter_cfg=None, lmcs_chroma=None, recon_frame=None,
                    lmcs_fwd=None):
        """Decision pass + pure-execution reconstruction for one tile
        (tiles cut all prediction/entropy dependencies, so each call is
        self-contained and parallel).

        recon_frame: residual-coding source when it differs from the
        decision source (LMCS inter slices: decisions in the original
        domain, residuals in the mapped domain); lmcs_fwd: forward LUT
        applied to inter luma predictions (reference: Reshape — MC preds
        are forward-mapped before residual addition)."""
        from vvc.enc.mode_decide import decide_modes
        from vvc.utils import perf
        sps = self.sps
        with perf.phase("recon_decide"):
            preds = decide_modes(leaves_t, (frame.y, frame.cb, frame.cr),
                                 qp, sps.bit_depth, sps,
                                 inter_cfg=inter_cfg, refs=refs)
        rf = recon_frame if recon_frame is not None else frame
        with perf.phase("recon_exec"):
            reconstruct_leaves(leaves_t, recon, qp, sps.bit_depth,
                               orig_planes=(rf.y, rf.cb, rf.cr),
                               lossless=sps.lossless, refs=refs,
                               dep_quant=sps.dep_quant,
                               inter_cfg=inter_cfg,
                               lmcs_chroma=lmcs_chroma,
                               pred_cache=preds if preds else None,
                               lmcs_fwd_lut=lmcs_fwd)

    def _entropy_rows_wpp(self, split_map, leaf_map, qp, sao_params,
                          slice_type=SliceType.I, n_ref=(0, 0),
                          col_info=(None, 0, ((), ()))):
        """WPP (sps_entropy_coding_sync, SURVEY.md §2.7 P-2): one CABAC
        substream per CTU row; row r+1's contexts initialize from a
        snapshot of row r's state taken after its first CTU — the 1-CTU
        stagger that lets rows encode/decode in parallel.  Spatial
        prediction still crosses rows (unlike tiles), so syntax state and
        reconstruction stay frame-wide."""
        from vvc.cabac.sao_syntax import write_sao_params
        from vvc.model.motion import MotionState
        sps = self.sps
        state = CodingState(sps.width, sps.height)   # shared across rows
        mstate = MotionState(sps.width, sps.height)
        inherit = None
        substreams = []
        for cy in range(0, sps.height, sps.ctu_size):
            ctxs = SliceContexts(qp)
            if inherit is not None:
                ctxs.states[:] = inherit
            enc = (native_packer.NativeBinEncoder(ctxs)
                   if native_packer.available() else BinEncoder())
            writer = TreeWriter(enc, ctxs, state, sps.width, sps.height,
                                split_map, leaf_map, sps.ctu_size,
                                sps.min_cu_size, mts_enabled=sps.mts_intra,
                                cclm_enabled=sps.cclm, mip_enabled=sps.mip,
                            lfnst_enabled=sps.lfnst, isp_enabled=sps.isp,
                            mtt_enabled=sps.max_mtt_depth_intra > 0,
                            affine_enabled=sps.affine,
                            lossless_enabled=sps.lossless,
                            mmvd_enabled=sps.mmvd,
                            ciip_enabled=sps.ciip,
                            gpm_enabled=sps.gpm,
                            amvr_enabled=sps.amvr,
                            smvd_enabled=sps.smvd,
                            bcw_enabled=sps.bcw,
                                slice_type=int(slice_type), mstate=mstate,
                                n_ref=n_ref, col=col_info[0],
                                cur_poc=col_info[1], ref_pocs=col_info[2])
            first = True
            for cx in range(0, sps.width, sps.ctu_size):
                if sao_params is not None:
                    cs = self.sps.ctu_size
                    write_sao_params(
                        enc, ctxs, sao_params[(cx, cy)],
                        left=sao_params.get((cx - cs, cy)),
                        up=sao_params.get((cx, cy - cs)))
                writer.write_ctu(cx, cy)
                if first:
                    inherit = ctxs.states.copy()
                    first = False
            enc.encode_bin_trm(1)
            substreams.append(enc.finish())
        return substreams

    def _entropy_tile_native(self, leaves_t, size_map, tx0, tx1, qp,
                             sao_ser):
        """Native C++ tree-syntax writer (intra slices): one call per tile
        (vvc/packer/cabac_core.cpp tw_write) — byte-equal to _entropy_tile."""
        sps = self.sps
        ctxs = SliceContexts(qp)
        enc = native_packer.NativeBinEncoder(ctxs)
        recs, levels = native_packer.serialize_leaves(leaves_t)
        tw = native_packer.NativeTreeWriter(
            min(tx1, sps.width), sps.height, sps.ctu_size, sps.min_cu_size,
            mts=sps.mts_intra, cclm=sps.cclm, mip=sps.mip, lfnst=sps.lfnst)
        sao_arr, stride = sao_ser if sao_ser is not None else (None, 0)
        tw.write(enc, ctxs, size_map, recs, levels, sao_arr, stride,
                 tx0, tx1, 0, sps.height, tx0)
        enc.encode_bin_trm(1)
        return enc.finish()

    def _entropy_rows_wpp_native(self, leaves, size_map, qp, sao_ser):
        """Native WPP rows: shared tree state, per-row substreams with the
        1-CTU-stagger context snapshot taken inside the native call."""
        sps = self.sps
        tw = native_packer.NativeTreeWriter(
            sps.width, sps.height, sps.ctu_size, sps.min_cu_size,
            mts=sps.mts_intra, cclm=sps.cclm, mip=sps.mip, lfnst=sps.lfnst)
        sao_arr, stride = sao_ser if sao_ser is not None else (None, 0)
        inherit = None
        substreams = []
        for cy in range(0, sps.height, sps.ctu_size):
            row_leaves = [l for l in leaves
                          if l.y0 // sps.ctu_size == cy // sps.ctu_size]
            recs, levels = native_packer.serialize_leaves(row_leaves)
            ctxs = SliceContexts(qp)
            if inherit is not None:
                ctxs.states[:] = inherit
            enc = native_packer.NativeBinEncoder(ctxs)
            inherit = tw.write(enc, ctxs, size_map, recs, levels, sao_arr,
                               stride, 0, sps.width, cy, cy + sps.ctu_size,
                               0, snapshot=True)
            enc.encode_bin_trm(1)
            substreams.append(enc.finish())
        return substreams

    def _entropy_tile(self, split_map, leaf_map, tx0, tx1, qp, sao_params,
                      slice_type=SliceType.I, n_ref=(0, 0),
                      col_info=(None, 0, ((), ())), ty0=0, ty1=None):
        from vvc.cabac.sao_syntax import write_sao_params
        from vvc.model.motion import MotionState
        sps = self.sps
        ctxs = SliceContexts(qp)
        enc = (native_packer.NativeBinEncoder(ctxs)
               if native_packer.available() else BinEncoder())
        state = CodingState(sps.width, sps.height)
        writer = TreeWriter(enc, ctxs, state, min(tx1, sps.width), sps.height,
                            split_map, leaf_map, sps.ctu_size,
                            sps.min_cu_size, mts_enabled=sps.mts_intra,
                            cclm_enabled=sps.cclm, mip_enabled=sps.mip,
                            lfnst_enabled=sps.lfnst, isp_enabled=sps.isp,
                            mtt_enabled=sps.max_mtt_depth_intra > 0,
                            affine_enabled=sps.affine,
                            lossless_enabled=sps.lossless,
                            mmvd_enabled=sps.mmvd,
                            ciip_enabled=sps.ciip,
                            gpm_enabled=sps.gpm,
                            amvr_enabled=sps.amvr,
                            smvd_enabled=sps.smvd,
                            bcw_enabled=sps.bcw,
                            slice_type=int(slice_type),
                            mstate=MotionState(sps.width, sps.height),
                            n_ref=n_ref, col=col_info[0],
                            cur_poc=col_info[1], ref_pocs=col_info[2])
        if ty1 is None:
            ty1 = sps.height
        for cy in range(ty0, ty1, sps.ctu_size):
            for cx in range(tx0, tx1, sps.ctu_size):
                if sao_params is not None:
                    cs = sps.ctu_size
                    write_sao_params(
                        enc, ctxs, sao_params[(cx, cy)],
                        left=(sao_params.get((cx - cs, cy))
                              if cx - cs >= tx0 else None),
                        up=(sao_params.get((cx, cy - cs))
                            if cy - cs >= ty0 else None))
                writer.write_ctu(cx, cy)
        enc.encode_bin_trm(1)
        return enc.finish()

    def encode_frame(self, frame: Frame, poc: int, rdo_result=None,
                     slice_type=SliceType.I, refs_l0=(), refs_l1=(),
                     qp=None, col=None, retained_pocs=()):
        """Returns (nal_units, recon Frame, stats dict).

        rdo_result: optional precomputed (split_map, leaf_map, leaves) from
        the GOP-batched search (rdo_partition_frames).
        refs_l0/refs_l1: [(poc, Frame), ...] reference pictures (filtered
        reconstructions, nearest first) for P/B slices."""
        sps, pps = self.sps, self.pps
        qp = pps.init_qp if qp is None else qp
        bd = sps.bit_depth
        inter_slice = slice_type != SliceType.I
        n_ref = (len(refs_l0), len(refs_l1))
        ref_planes = ([(f.y, f.cb, f.cr) for _, f in refs_l0],
                      [(f.y, f.cb, f.cr) for _, f in refs_l1])

        lmcs_cw = None
        src = frame
        recon_src = None
        lmcs_fwd = None
        if sps.lmcs and not sps.lossless:
            from vvc.kernels.lmcs import derive_codewords, build_luts, map_plane
            lmcs_cw = derive_codewords(frame.y, bd)
            fwd_lut, self._inv_lut = build_luts(lmcs_cw, bd)
            if not inter_slice:
                # intra: forward-map luma; the whole search/recon pipeline
                # runs in the mapped domain (reference: Reshape.cpp layout)
                src = Frame(map_plane(frame.y, fwd_lut), frame.cb,
                            frame.cr, bd)
                rdo_result = None  # precomputed RDO used the unmapped domain
            else:
                # inter (reference: EncReshape SDR inter reshaping): ME and
                # decisions stay in the original domain (refs are original),
                # residual coding runs mapped — recon consumes the mapped
                # original and forward-maps every inter luma prediction
                recon_src = Frame(map_plane(frame.y, fwd_lut), frame.cb,
                                  frame.cr, bd)
                lmcs_fwd = fwd_lut

        from vvc.utils import perf
        chroma_on_device = False
        if rdo_result is not None:
            split_map, leaf_map, leaves = rdo_result
            chroma_on_device = sps.cclm   # GOP-batched search decides chroma
        elif inter_slice:
            from vvc.enc.inter_search import rdo_inter_partition
            with perf.phase("search_inter"):
                split_map, leaf_map, leaves = rdo_inter_partition(
                    src.y, [f.y for _, f in refs_l0],
                    [f.y for _, f in refs_l1],
                    qp, bd, sps.ctu_size, sps.min_cu_size,
                    is_b=slice_type == SliceType.B, affine=sps.affine)
        elif pps.num_tile_cols > 1:
            # per-tile search: the same unit the sharded multi-device
            # encode distributes (vvc.shard.encode) — 1-dev == N-dev
            from vvc.enc.rdo import rdo_partition_tiled
            split_map, leaf_map, leaves = rdo_partition_tiled(
                src.y, tile_columns(pps.num_tile_cols, sps.width,
                                    sps.ctu_size),
                qp, bd, sps.ctu_size, sps.min_cu_size,
                lossless=sps.lossless, lfnst=sps.lfnst,
                chroma_planes=(src.cb, src.cr) if sps.cclm else None,
                mtt=sps.max_mtt_depth_intra > 0, isp=sps.isp)
            chroma_on_device = sps.cclm
        else:
            split_map, leaf_map, leaves = rdo_partition(
                src.y, qp, bd, sps.ctu_size, sps.min_cu_size,
                lossless=sps.lossless, lfnst=sps.lfnst,
                chroma_planes=(src.cb, src.cr) if sps.cclm else None,
                mtt=sps.max_mtt_depth_intra > 0, isp=sps.isp)
            chroma_on_device = sps.cclm
        if sps.cclm and not chroma_on_device:
            intra_leaves = [l for l in leaves if l.pred == 0]
            if intra_leaves:
                _decide_chroma_modes(intra_leaves, src, bd)

        cols = tile_columns(pps.num_tile_cols, sps.width, sps.ctu_size)
        rows = tile_columns(pps.num_tile_rows, sps.height, sps.ctu_size)
        tiles = tile_grid(pps.num_tile_cols, pps.num_tile_rows, sps.width,
                          sps.height, sps.ctu_size)
        recon = (np.zeros_like(frame.y), np.zeros_like(frame.cb),
                 np.zeros_like(frame.cr))
        leaves_per_tile = [[l for l in leaves
                            if tx0 <= l.x0 < tx1 and ty0 <= l.y0 < ty1]
                           for tx0, tx1, ty0, ty1 in tiles]

        # phase 1: reconstruction per tile (availability maps are per-call,
        # so tiles are isolated and parallel)
        inter_cfg = None
        if inter_slice:
            inter_cfg = {"bdof": sps.bdof, "dmvr": sps.dmvr, "cur_poc": poc,
                         "ref_pocs": (tuple(p for p, _ in refs_l0),
                                      tuple(p for p, _ in refs_l1)),
                         "ciip": sps.ciip, "gpm": sps.gpm, "bcw": sps.bcw,
                         "col": col, "n_ref": n_ref,
                         "is_b": slice_type == SliceType.B}

        def recon_tile(i):
            self._recon_tile(src, recon, leaves_per_tile[i], qp,
                             refs=ref_planes if inter_slice else None,
                             inter_cfg=inter_cfg, lmcs_chroma=lmcs_cw,
                             recon_frame=recon_src, lmcs_fwd=lmcs_fwd)

        with perf.phase("recon"):
            if self.parallel_tiles and len(tiles) > 1:
                with concurrent.futures.ThreadPoolExecutor(len(tiles)) as ex:
                    list(ex.map(recon_tile, range(len(tiles))))
            else:
                for i in range(len(tiles)):
                    recon_tile(i)

        # LMCS inverse map precedes the loop filters (original domain)
        if lmcs_cw is not None:
            from vvc.kernels.lmcs import map_plane
            recon[0][:] = map_plane(recon[0], self._inv_lut)

        # phase 2+3: in-loop filters (reference order: deblock → SAO)
        perf_filters = perf.phase("filters")
        perf_filters.__enter__()
        tile_bx = tuple(t[0] for t in cols[1:])
        tile_by = tuple(t[0] for t in rows[1:])
        if sps.deblocking and not sps.lossless:
            from vvc.kernels.deblock import deblock_frame
            with perf.phase("filt_deblock"):
                deblock_frame(recon, leaves, qp, bd, tile_x_bounds=tile_bx,
                              tile_y_bounds=tile_by)
        sao_params = None
        if sps.sao and not sps.lossless:
            from vvc.enc.sao_enc import decide_sao_frame
            from vvc.kernels.sao import sao_filter_plane
            with perf.phase("filt_sao"):
                sao_params = decide_sao_frame(
                    (frame.y, frame.cb, frame.cr), recon, qp, bd,
                    sps.ctu_size, tiles)
                for comp in range(3):
                    per_comp = {k: v[comp] for k, v in sao_params.items()}
                    sao_filter_plane(recon[comp], per_comp, sps.ctu_size,
                                     bd, tiles,
                                     comp_scale=0 if comp == 0 else 1)
        alf_hdr = None
        if sps.alf and not sps.lossless:
            from vvc.enc.alf_enc import decide_alf_frame
            from vvc.kernels.alf import apply_alf_plane, apply_delta_gated
            perf_alf = perf.phase("filt_alf")
            perf_alf.__enter__()
            luma_c, flags, chroma_c, luma_delta = decide_alf_frame(
                (frame.y, frame.cb, frame.cr), recon, qp, bd, sps.ctu_size)
            flag_list = [flags[(x0, y0)]
                         for y0 in range(0, sps.height, sps.ctu_size)
                         for x0 in range(0, sps.width, sps.ctu_size)]
            if luma_c is not None:
                apply_delta_gated(recon[0], luma_delta, bd, flags,
                                  sps.ctu_size)
            if chroma_c is not None:
                apply_alf_plane(recon[1], chroma_c, 2, bd)
                apply_alf_plane(recon[2], chroma_c, 2, bd)
            # CC-ALF: additive chroma correction filtered from the final
            # luma (reference: applyCcAlfFilter; vvc.kernels.ccalf)
            from vvc.kernels.ccalf import derive_ccalf, apply_ccalf_delta
            cc_cb = derive_ccalf(frame.cb, recon[1], recon[0], bd)
            if cc_cb is not None:
                recon[1][:] = apply_ccalf_delta(recon[1], recon[0], cc_cb,
                                                bd)
            cc_cr = derive_ccalf(frame.cr, recon[2], recon[0], bd)
            if cc_cr is not None:
                recon[2][:] = apply_ccalf_delta(recon[2], recon[0], cc_cr,
                                                bd)
            alf_hdr = (luma_c if luma_c is not None else None,
                       flag_list if luma_c is not None else None,
                       chroma_c if chroma_c is not None else None,
                       cc_cb, cc_cr)
            perf_alf.__exit__(None, None, None)

        perf_filters.__exit__(None, None, None)
        # phase 4: entropy — WPP row substreams or per-tile (parallel).
        # Intra slices run the native C++ tree writer; inter falls back to
        # the Python TreeWriter (native inter syntax lands with merge RDO).
        col_info = (col, poc, (tuple(p for p, _ in refs_l0),
                               tuple(p for p, _ in refs_l1)))
        from vvc.utils.trace import active as _trace
        use_native = (USE_NATIVE_TREE and not inter_slice
                      and sps.ctu_size == 64
                      and sps.max_mtt_depth_intra == 0
                      and self.pps.num_tile_rows == 1
                      and not sps.isp and not sps.mrl
                      and not sps.lossless
                      and not _trace().enabled
                      and native_packer.available())
        if use_native:
            size_map = native_packer.build_size_map(
                leaves, sps.width, sps.height, sps.min_cu_size)
            sao_ser = (native_packer.serialize_sao(
                sao_params, sps.width, sps.height, sps.ctu_size)
                if sao_params is not None else None)
        if pps.wpp:
            assert len(tiles) == 1, "tiles+WPP combination lands later"
            if use_native:
                substreams = self._entropy_rows_wpp_native(
                    leaves, size_map, qp, sao_ser)
            else:
                substreams = self._entropy_rows_wpp(split_map, leaf_map, qp,
                                                    sao_params, slice_type,
                                                    n_ref, col_info)
        else:
            def entropy_tile(i):
                tx0, tx1, ty0, ty1 = tiles[i]
                if use_native:
                    return self._entropy_tile_native(
                        leaves_per_tile[i], size_map, tx0, tx1, qp, sao_ser)
                return self._entropy_tile(split_map, leaf_map, tx0, tx1, qp,
                                          sao_params, slice_type, n_ref,
                                          col_info, ty0=ty0, ty1=ty1)

            with perf.phase("entropy"):
                if self.parallel_tiles and len(tiles) > 1:
                    with concurrent.futures.ThreadPoolExecutor(
                            len(tiles)) as ex:
                        substreams = list(ex.map(entropy_tile,
                                                 range(len(tiles))))
                else:
                    substreams = [entropy_tile(i) for i in range(len(tiles))]

        sh = SliceHeader(pps.pps_id, int(slice_type), poc, qp,
                         l0_deltas=tuple(poc - p for p, _ in refs_l0),
                         l1_deltas=tuple(poc - p for p, _ in refs_l1),
                         retained_deltas=tuple(poc - p
                                               for p in retained_pocs))
        # filter/reshaper parameters ride APS NALs ahead of the slice
        # (reference: EncGOP xWriteAPS; ids cycle per picture like the
        # reference's ALF APS pool)
        from vvc.hls.aps import write_aps_alf, write_aps_lmcs
        aps_nals = []
        alf_aps_id = lmcs_aps_id = 0
        alf_sh = None
        if sps.alf and alf_hdr is not None:
            luma_c, flag_list, chroma_c, cc_cb, cc_cr = alf_hdr
            if (luma_c is not None or chroma_c is not None
                    or cc_cb is not None or cc_cr is not None):
                alf_aps_id = poc % 32
                aps_nals.append(NalUnit(NalUnitType.PREFIX_APS,
                                        write_aps_alf(alf_aps_id, luma_c,
                                                      chroma_c, cc_cb,
                                                      cc_cr)))
            alf_sh = (luma_c is not None or None, flag_list,
                      (chroma_c is not None or cc_cb is not None
                       or cc_cr is not None) or None)
        if sps.lmcs and lmcs_cw is not None:
            lmcs_aps_id = poc % 32
            aps_nals.append(NalUnit(NalUnitType.PREFIX_APS,
                                    write_aps_lmcs(lmcs_aps_id, lmcs_cw)))
        header = write_slice_header(sh, pps.init_qp,
                                    entry_sizes=[len(s) for s in substreams],
                                    alf=alf_sh if sps.alf else None,
                                    lmcs_cw=lmcs_cw if sps.lmcs else None,
                                    lmcs_enabled=sps.lmcs,
                                    alf_aps_id=alf_aps_id,
                                    lmcs_aps_id=lmcs_aps_id)
        slice_rbsp = header + b"".join(substreams)
        nal_type = (NalUnitType.IDR_N_LP if slice_type == SliceType.I
                    else NalUnitType.TRAIL)
        nals = aps_nals + [
            NalUnit(nal_type, slice_rbsp),
            NalUnit(NalUnitType.SUFFIX_SEI, _hash_sei_payload(recon, bd))]
        rec_frame = Frame(*recon, bd)
        self.last_leaves = leaves   # for the sequence driver's TMVP field
        stats = {
            "bits": sum(8 * (len(n.payload) + 2) for n in nals),
            "psnr_y": psnr(frame.y, recon[0], bd),
            "psnr_cb": psnr(frame.cb, recon[1], bd),
            "psnr_cr": psnr(frame.cr, recon[2], bd),
            "n_cu": len(leaves),
            "n_tiles": len(tiles),
        }
        return nals, rec_frame, stats


def encode_sequence(frames, qp: int = 32, bit_depth: int = 8,
                    ctu_size: int = 64,
                    num_tile_cols: int = 1, num_tile_rows: int = 1,
                    lossless: bool = False,
                    parallel_tiles: bool = True, wpp: bool = False,
                    lmcs: bool = False, mode: str = "ai",
                    gop_size: int = 16, intra_period: int = -1,
                    target_kbps: float = 0.0, fps: float = 30.0,
                    dep_quant: bool = False, mctf: bool = False,
                    bdof: bool = False, dmvr: bool = False,
                    mtt: bool = False, isp: bool = False,
                    affine: bool = False, mmvd: bool = False,
                    ciip: bool = False, gpm: bool = False,
                    mrl: bool = False, amvr: bool = False,
                    smvd: bool = False, bcw: bool = False,
                    poc_base: int = 0, _precomputed_rdo=None,
                    checkpoint_path: str | None = None,
                    resume: bool = False):
    """Encode frames (list of Frame) → (annexb bytes, recons, stats).

    mode: "ai" (all-intra), "ldp" (low-delay P), "ra" (random access
    hierarchical B) — reference: EncGOP::compressGOP GOP structures.
    target_kbps > 0 enables R-λ rate control (vvc.enc.ratectrl); QP then
    tracks the bit budget instead of the fixed base QP.
    recons/stats are returned in display (POC) order.
    checkpoint_path: encoder state (DPB recons, RC, NALs so far) is
    written there after each temporal-layer-0 anchor — the GOP-boundary
    checkpoint of SURVEY §5.4 (all cross-GOP state is explicit arrays);
    resume=True continues an interrupted encode from it, byte-identical
    to an uninterrupted run (tests/test_checkpoint.py).
    poc_base: slice-header POC offset — multi-host GOP-segment encoding
    (vvc.shard.dcn) gives each segment its global POC range so the
    concatenated stream (parcat) decodes in true display order."""
    from vvc.enc.gop import gop_order

    h, w = frames[0].y.shape
    sps = SPS(width=w, height=h, bit_depth=bit_depth, ctu_size=ctu_size,
              deblocking=not lossless, mts_intra=not lossless,
              mip=not lossless, lfnst=not lossless,
              sao=not lossless, alf=not lossless, cclm=not lossless,
              lmcs=lmcs and not lossless, lossless=lossless,
              max_mtt_depth_intra=2 if (mtt and not lossless) else 0,
              isp=isp and not lossless,
              dep_quant=dep_quant and not lossless,
              bdof=bdof and mode == "ra", dmvr=dmvr and mode == "ra",
              affine=affine and mode != "ai" and not lossless,
              mmvd=mmvd and mode != "ai" and not lossless,
              ciip=ciip and mode != "ai" and not lossless,
              gpm=gpm and mode == "ra" and not lossless,
              mrl=mrl and not lossless,
              amvr=amvr and mode != "ai" and not lossless,
              smvd=smvd and mode == "ra" and not lossless,
              bcw=bcw and mode == "ra" and not lossless)
    pps = PPS(init_qp=qp, num_tile_cols=num_tile_cols,
              num_tile_rows=num_tile_rows, wpp=wpp)
    enc = Encoder(sps, pps, parallel_tiles)
    nals = [NalUnit(NalUnitType.SPS, write_sps(sps)),
            NalUnit(NalUnitType.PPS, write_pps(pps))]
    recons = [None] * len(frames)
    stats = [None] * len(frames)
    order = gop_order(len(frames), mode, gop_size, intra_period)

    rc = None
    if target_kbps > 0:
        from vvc.enc.ratectrl import RateCtrl, LEVEL_WEIGHT, INTRA_WEIGHT
        ws = [INTRA_WEIGHT if e.slice_type == SliceType.I
              else LEVEL_WEIGHT.get(min(e.tid, 5), 0.3) for e in order]
        rc = RateCtrl(target_kbps, fps, len(frames), base_qp=qp,
                      avg_weight=sum(ws) / len(ws))
    n_pix = w * h

    if (mode == "ai" and rc is None and not lmcs
            and num_tile_cols == 1 and _precomputed_rdo is None):
        # AI pipeline: per-frame async RDO dispatches queue on the device
        # while a host thread pool runs recon/filters/entropy for earlier
        # frames (frames are independent; the native cores release the GIL).
        # Reference analog: OpenVVC frame threads (ovthreads.c) — here the
        # devices pipeline against the host instead of cores against cores.
        from vvc.enc.rdo import rdo_partition_dispatch, rdo_partition_finish
        handles = [rdo_partition_dispatch(
            f.y, qp, bit_depth, sps.ctu_size, sps.min_cu_size,
            lossless=lossless, lfnst=sps.lfnst,
            chroma_planes=(f.cb, f.cr) if sps.cclm else None,
            mtt=sps.max_mtt_depth_intra > 0, isp=sps.isp)
            for f in frames]

        def do_frame(poc):
            rdo_result = rdo_partition_finish(handles[poc])
            return enc.encode_frame(frames[poc], poc + poc_base, rdo_result,
                                    slice_type=SliceType.I)

        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            results = list(ex.map(do_frame, range(len(frames))))
        for poc, (n, r, s) in enumerate(results):
            nals += n
            recons[poc] = r
            s["slice_type"] = int(SliceType.I)
            s["poc"] = poc
            s["qp"] = qp
            stats[poc] = s
        return write_annexb(nals), recons, stats

    if _precomputed_rdo is not None:
        # sharded path (vvc.shard.encode): per-(frame, tile) RDO already ran
        # on the mesh; this call only assembles recon/entropy/NALs
        rdo_results = _precomputed_rdo
    elif mode == "ai" and num_tile_cols == 1:
        # one device dispatch for the whole sequence's RDO search (AI frames
        # are independent); host recon/entropy then proceeds per frame
        rdo_results = rdo_partition_frames(
            [f.y for f in frames], qp, bit_depth, sps.ctu_size,
            sps.min_cu_size, lossless=lossless, lfnst=sps.lfnst,
            chroma_planes=(([f.cb for f in frames], [f.cr for f in frames])
                           if sps.cclm else None),
            mtt=sps.max_mtt_depth_intra > 0, isp=sps.isp)
    else:
        rdo_results = None

    dpb = {}   # poc -> filtered recon Frame (reference: DecLib m_cListPic)
    col_dpb = {}  # poc -> ColMotion for TMVP
    # reference marking: a picture stays in the DPB only while a
    # not-yet-coded entry references it (reference:
    # Slice::applyReferencePictureListBasedMarking; r3 kept every frame
    # forever — VERDICT r3 weak #9)
    needed_after = []
    fut = set()
    for e in reversed(order):
        needed_after.append(frozenset(fut))
        fut.update(e.l0)
        fut.update(e.l1)
    needed_after.reverse()
    from vvc.model.motion import motion_field_from_leaves
    from vvc.common.types import SliceType as ST
    start_ei = 0
    ck_key = (len(frames), qp, mode, gop_size, intra_period, target_kbps,
              poc_base, w, h, bit_depth)
    if resume and checkpoint_path:
        import os as _os
        import pickle as _pickle
        if _os.path.exists(checkpoint_path):
            with open(checkpoint_path, "rb") as fh:
                ck = _pickle.load(fh)
            assert ck["key"] == ck_key, "checkpoint/config mismatch"
            start_ei = ck["next_ei"]
            nals = ck["nals"]
            dpb = ck["dpb"]
            col_dpb = ck["col_dpb"]
            rc = ck["rc"]
            for p, r in ck["recons"].items():
                recons[p] = r
            for p, st_ in ck["stats"].items():
                stats[p] = st_
    for ei, e in enumerate(order):
        if ei < start_ei:
            continue
        f = frames[e.poc]
        if mctf and mode != "ai" and e.tid == 0 and len(frames) > 1:
            # MCTF pre-filter on temporal-layer-0 anchors (reference:
            # EncTemporalFilter applied in EncLib::encodePrep)
            from vvc.enc.mctf import mctf_filter
            from vvc.utils import perf
            with perf.phase("mctf"):
                f = mctf_filter(frames, e.poc, qp, bit_depth)
        refs_l0 = [(p + poc_base, dpb[p]) for p in e.l0]
        refs_l1 = [(p + poc_base, dpb[p]) for p in e.l1]
        # collocated picture: L1[0] for B, L0[0] for P (reference:
        # Slice::setColFromL0Flag default)
        col = None
        if e.slice_type == ST.B and e.l1:
            col = col_dpb.get(e.l1[0])
        elif e.slice_type == ST.P and e.l0:
            col = col_dpb.get(e.l0[0])
        if rc is not None:
            pic_qp, lam = rc.pic_qp(int(e.slice_type), e.tid, n_pix)
        else:
            pic_qp = min(63, qp + e.qp_offset)
        n, r, s = enc.encode_frame(
            f, e.poc + poc_base,
            rdo_results[e.poc] if rdo_results is not None else None,
            slice_type=e.slice_type, refs_l0=refs_l0, refs_l1=refs_l1,
            qp=pic_qp, col=col,
            retained_pocs=tuple(p + poc_base
                                for p in sorted(needed_after[ei])))
        col_dpb[e.poc] = motion_field_from_leaves(
            enc.last_leaves, w, h, e.poc + poc_base,
            (tuple(p + poc_base for p in e.l0),
             tuple(p + poc_base for p in e.l1)))
        if rc is not None:
            rc.update(int(e.slice_type), e.tid, s["bits"], n_pix, lam)
        nals += n
        dpb[e.poc] = r
        recons[e.poc] = r
        if f is not frames[e.poc]:
            # MCTF path: report fidelity vs the TRUE source (reference:
            # xCalculateAddPSNR compares against the unfiltered original)
            s["psnr_y"] = psnr(frames[e.poc].y, r.y, bit_depth)
            s["psnr_cb"] = psnr(frames[e.poc].cb, r.cb, bit_depth)
            s["psnr_cr"] = psnr(frames[e.poc].cr, r.cr, bit_depth)
        s["slice_type"] = int(e.slice_type)
        s["poc"] = e.poc
        s["qp"] = pic_qp
        stats[e.poc] = s
        # DPB bump: drop pictures no future entry references
        for p in [p for p in dpb if p not in needed_after[ei]]:
            del dpb[p]
            col_dpb.pop(p, None)
        if (checkpoint_path and ei + 1 < len(order)
                and order[ei + 1].tid == 0):
            import pickle as _pickle
            with open(checkpoint_path + ".tmp", "wb") as fh:
                _pickle.dump({"key": ck_key, "next_ei": ei + 1,
                              "nals": nals, "dpb": dpb,
                              "col_dpb": col_dpb, "rc": rc,
                              "recons": {p: r for p, r in enumerate(recons)
                                         if r is not None},
                              "stats": {p: st_ for p, st_
                                        in enumerate(stats)
                                        if st_ is not None}}, fh)
            import os as _os
            _os.replace(checkpoint_path + ".tmp", checkpoint_path)
    return write_annexb(nals), recons, stats
