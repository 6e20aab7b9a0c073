"""Scene -> device SoA buffers ("compile" the scene for the TPU renderer).

TPU-native replacement for both of the reference's backend scene preps
(raytracing-cpu/src/scene.rs BVH build; raytracing-optix/src/scene.rs GAS/IAS
+ SBT + texture upload): the primitive DAG is flattened by composing transform
chains down to each BasicPrimitive (mirroring Scene::descendants_iter
semantics, scene/scene.rs:201-224), triangle geometry is pre-transformed to
world space into structure-of-arrays buffers, a skip-link BVH is built over
the world-space triangles, and materials/textures/images/lights become flat
indexed tables. Everything is uploaded once per scene via device_put; renders
never re-upload (unlike the per-launch cudaMemcpy in pipeline.cu:471-556).

Spheres stay in object space with per-sphere o2w/w2o matrices (non-uniform
scales make world-space spheres ellipsoids); scenes have few analytic spheres
so they are brute-force intersected outside the BVH.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..accel import build_bvh
from ..geometry import Sphere, Transform, TriangleMesh
from ..lights import (
    DiffuseAreaLight, DirectionLight, EnvironmentLight, PointLight,
)
from ..materials import (
    CheckerTexture, CoatedDiffuse, ConstantTexture, Diffuse, FilterMode,
    ImageTexture, MixTexture, RoughConductor, RoughDielectric, ScaleTexture,
    SmoothConductor, SmoothDielectric,
)
from ..scene import BasicPrimitive, Scene
from ..scene.camera import Orthographic, PinholePerspective, ThinLensPerspective

F = np.float32

# material kinds
MAT_DIFFUSE = 0
MAT_SMOOTH_DIELECTRIC = 1
MAT_SMOOTH_CONDUCTOR = 2
MAT_ROUGH_DIELECTRIC = 3
MAT_ROUGH_CONDUCTOR = 4
MAT_COATED_DIFFUSE = 5

# texture kinds
TEX_IMAGE = 0
TEX_CONSTANT = 1
TEX_CHECKER = 2
TEX_SCALE = 3
TEX_MIX = 4

# light kinds
LIGHT_POINT = 0
LIGHT_DIRECTION = 1
LIGHT_AREA = 2

# camera kinds
CAM_ORTHOGRAPHIC = 0
CAM_PINHOLE = 1
CAM_THIN_LENS = 2


@dataclass(frozen=True)
class SceneMeta:
    """Static (hashable) scene facts; part of the jit specialization key."""

    n_tris: int
    n_spheres: int
    n_lights: int
    n_materials: int
    n_textures: int
    light_kinds: Tuple[int, ...]
    mat_kinds_present: Tuple[int, ...]
    tex_kinds_present: Tuple[int, ...]
    any_trilinear: bool
    any_nearest: bool
    has_env: bool
    env_tex: int
    # camera
    cam_kind: int
    width: int
    height: int
    near_clip: float
    far_clip: float
    aperture_radius: float
    focal_distance: float
    # stack traversal: encoded root child-meta + tree depth (stack bound)
    root_meta: int = -1
    bvh2_depth: int = 1
    # unpadded BVH node count == skip-link walk sentinel
    n_bvh_nodes: int = 0
    # quad (BVH4) walk: root meta + stack bound
    root_meta4: int = -1
    bvh4_stack: int = 4
    # per-callsite texture-kind narrowing (ops/textures.py): kinds
    # reachable from each material slot / the env texture; () = fall
    # back to tex_kinds_present
    slot_kinds: Tuple[Tuple[int, ...], ...] = ()
    env_kinds: Tuple[int, ...] = ()
    # rowrec (switch-free) walk: root meta in rowrec leaf numbering
    root_meta4r: int = -1
    # transposed BVH8 walk (bvh8t): stack bound + node width (8/16/32)
    t8_stack: int = 4
    t8_width: int = 8
    # number of INTERNAL children of the bvh8t root — their slot boxes
    # (t8_nodes rows 0..n-1, cols 0:6) double as the subtree-candidate
    # table of the bounce-sort key (ops/traverse.py::ray_sort_key)
    t8_root_ints: int = 0
    # tris per merged bvh8t leaf group (sublane rows per tri block)
    t8_leaf: int = 8
    # big-scene chunked accel: per-chunk (stack, root_min3, root_max3)
    t8_chunk_meta: Tuple[Tuple, ...] = ()
    # instancing (TLAS-over-shared-BLAS equivalent): per-BLAS statics
    # (n_tris, root_meta, bvh2_depth, root_meta4, bvh4_stack, n_nodes,
    #  root_meta4r, t8_stack)
    blas_meta: Tuple[Tuple[int, ...], ...] = ()
    # per-instance statics (blas_id, vtri_base, n_tris, shade_off)
    instances: Tuple[Tuple[int, int, int, int], ...] = ()
    # first virtual-triangle prim id (= n_tris + padded sphere count)
    inst_vtri_base0: int = 0


class BlasTables(NamedTuple):
    """Device tables of one shared BLAS (object-space geometry, built once
    regardless of instance count — counterpart of the reference's IAS over
    shared GAS, csrc/host/scene.cu:162-250 / accel.rs:119-214)."""

    bvh2_rows: jax.Array     # (M, 16) child-pair rows (XLA stack walk)
    tri_pack: jax.Array      # (T, 9)
    bvh4_recs_pk: jax.Array  # packed quad records (Pallas)
    bvh2_rows_pk: jax.Array
    bvh_nodes_pk: jax.Array
    tri_pack_pk: jax.Array
    bvh4_rows: jax.Array     # (K, 128) switch-free quad record rows
    tri_rows: jax.Array      # (L, 128) 8-aligned leaf tri rows
    t8_nodes: jax.Array      # (B*8, 128) transposed BVH8 node blocks
    t8_meta: jax.Array       # (N8, 2) i32 per-node scalars (SMEM)
    t8_tris: jax.Array       # (G*8, 128) transposed tri-group blocks


@jax.tree_util.register_dataclass
@dataclass
class DeviceScene:
    # triangles, world-space, BVH order, padded
    tri_p0: jax.Array
    tri_p1: jax.Array
    tri_p2: jax.Array
    tri_n0: jax.Array
    tri_n1: jax.Array
    tri_n2: jax.Array
    tri_uv0: jax.Array
    tri_uv1: jax.Array
    tri_uv2: jax.Array
    tri_mat: jax.Array
    tri_light: jax.Array
    tri_has_n: jax.Array
    tri_has_uv: jax.Array
    # skip-link BVH
    bvh_min: jax.Array
    bvh_max: jax.Array
    bvh_first: jax.Array
    bvh_count: jax.Array
    bvh_skip: jax.Array
    # packed traversal layouts: one gather per node / per leaf triangle.
    # bvh_nodes (N, 8) f32 = [min.xyz, max.xyz, bits((first<<3)|count),
    # bits(skip)]; tri_pack (T, 9) f32 = [p0, p1, p2]
    bvh_nodes: jax.Array
    tri_pack: jax.Array
    # 128-lane packed tables for the Pallas lockstep walk (Mosaic pads the
    # minor dim to 128, so narrow tables would blow up 16x in VMEM)
    bvh_nodes_pk: jax.Array   # (ceil(N/16), 128) f32, 16 node records/row
    tri_pack_pk: jax.Array    # (ceil(T/8), 128) f32, 8 tri records/row
    bvh2_rows_pk: jax.Array   # (ceil(M/8), 128) f32, 8 child-pair records/row
    bvh4_recs_pk: jax.Array   # (ceil(K/4), 128) f32, 4 quad records/row
    bvh4_rows: jax.Array      # (K, 128) f32, ONE quad record/row (no switch)
    tri_rows: jax.Array       # (L, 128) f32, 8-aligned leaf tri rows
    t8_nodes: jax.Array       # (B*8, 128) transposed BVH8 node blocks
    t8_meta: jax.Array        # (N8, 2) i32 per-node scalars (SMEM)
    t8_tris: jax.Array        # (G*8, 128) transposed tri-group blocks
    # big-scene chunked accel: tuple of (nodes, meta, tris) per chunk
    t8_chunks: Tuple
    # single-gather shading rows (XLA gathers cost ~the same per ROW
    # regardless of width, so 13 narrow gathers fold into 1 wide one):
    # tri_shade (T, 32): p0 p1 p2 n0 n1 n2 uv0 uv1 uv2 | bits: mat light
    # has_n has_uv; em_shade (E, 24): p0 p1 p2 n0 n1 n2 area bits(has_n)
    tri_shade: jax.Array
    em_shade: jax.Array
    mat_pack: jax.Array   # (M, 8) i32: kind, tex0..4, remap
    tex_pack: jax.Array   # (X, 16) f32: v0, v1, bits[ref0/first_level,
                          # ref1, ref2, kind, filter, wrap, n_levels]
    # material-major join of the 5 texture slots' rows (M, 80): slot j's
    # tex_pack row (of max(tex_id, 0), matching eval_texture's clamp) at
    # cols 16j..16j+16 — ONE row gather per bounce replaces the material
    # row + five texture row gathers (gathers cost per ROW; the bounce
    # body's table gathers were ~22% of device time, docs/PERF_LOG.md)
    mat_tex_rows: jax.Array
    lvl_pack: jax.Array   # (LV, 4) i32: offset, w, h
    # child-pair rows for stack-based near-first traversal: one row per
    # INTERNAL node = [L.min, L.max, R.min, R.max, bits(metaL), bits(metaR),
    # pad, pad] (16 f32). meta encodes a child: leaf -> (first<<3)|count
    # (count in 1..MAX_LEAF), internal -> row_index<<3 (low bits 0).
    bvh2_rows: jax.Array
    # spheres (object-space)
    sph_center: jax.Array
    sph_radius: jax.Array
    sph_o2w: jax.Array
    sph_w2o: jax.Array
    sph_mat: jax.Array
    sph_light: jax.Array
    # materials
    mat_kind: jax.Array
    mat_tex: jax.Array      # (M, 5) texture ids, -1 = unset
    mat_remap: jax.Array    # (M,) bool remap_roughness
    # textures (one level of indirection; scale/mix reference leaves)
    tex_kind: jax.Array
    tex_v0: jax.Array       # (X, 4) constant value / checker color1
    tex_v1: jax.Array       # (X, 4) checker color2
    tex_ref: jax.Array      # (X, 3) scale/mix refs or (image_id, -1, -1)
    tex_filter: jax.Array
    tex_wrap: jax.Array
    # image mip atlas
    img_texels: jax.Array        # (P, 4)
    # quad atlas: row i = the full clamped 2x2 bilinear footprint anchored
    # at texel i ([p(x,y), p(x+1,y), p(x,y+1), p(x+1,y+1)], +1 edge-clamped
    # at build time) — ONE row gather per bilerp tap instead of four.
    # None when the scene has no images, the 4x blow-up exceeds the
    # memory cap, or the backend is CPU (default — see the build site;
    # textures.py falls back to the 4-gather path).
    img_quads: Optional[jax.Array]  # (P, 16) or None
    img_level_offset: jax.Array  # (LV,)
    img_level_w: jax.Array
    img_level_h: jax.Array
    img_first_level: jax.Array   # (I,)
    img_n_levels: jax.Array
    # lights
    light_kind: jax.Array
    light_va: jax.Array     # (L, 3) position / direction
    light_vb: jax.Array     # (L, 3) intensity / radiance
    light_emit_first: jax.Array
    light_emit_count: jax.Array
    # area-light emitter triangles (world-space)
    em_p0: jax.Array
    em_p1: jax.Array
    em_p2: jax.Array
    em_n0: jax.Array
    em_n1: jax.Array
    em_n2: jax.Array
    em_area: jax.Array
    em_has_n: jax.Array
    # camera
    cam_raster_to_camera: jax.Array  # (4, 4)
    cam_camera_to_world: jax.Array   # (4, 4)
    cam_min_diff: jax.Array          # (4, 3) x_o, y_o, x_d, y_d
    # scene bounds
    bounds_center: jax.Array
    bounds_radius: jax.Array
    # instancing: shared-BLAS tables + per-instance transforms
    blas_tables: Tuple[BlasTables, ...]
    inst_xf: jax.Array        # (max(1,I), 32) f32: [o2w 16 | w2o 16] row-major
    inst_aabb_min: jax.Array  # (max(1,I), 3) instance world AABB
    inst_aabb_max: jax.Array
    # static (hashable; not a pytree leaf)
    meta: SceneMeta = field(metadata=dict(static=True))


def _child_pair_layout(bvh):
    """Child-pair rows for stack traversal. Returns (rows, root_meta, depth).

    In the preorder skip-link layout the left child of internal i is i+1 and
    the right child is skip[i+1]; each internal node's row stores BOTH child
    boxes so near-first descent needs one gather per step.
    """
    count = bvh.count
    n_nodes = count.shape[0]
    is_int = count == 0
    if bvh.prim_order.shape[0] == 0:
        return np.zeros((8, 16), F), -1, 1
    row_of = np.full(n_nodes, -1, np.int64)
    row_of[np.nonzero(is_int)[0]] = np.arange(int(is_int.sum()))

    def child_meta(c):
        if count[c] > 0:
            return (int(bvh.left_first[c]) << 3) | int(count[c])
        return int(row_of[c]) << 3

    m = int(is_int.sum())
    if m == 0:
        # single-leaf tree: root itself is a leaf
        root_meta = (int(bvh.left_first[0]) << 3) | int(count[0])
        return np.zeros((8, 16), F), root_meta, 1

    ints = np.nonzero(is_int)[0]
    left = ints + 1
    right = bvh.skip[left].astype(np.int64)

    def child_metas(c):
        leaf = count[c] > 0
        return np.where(
            leaf,
            (bvh.left_first[c].astype(np.int64) << 3) | count[c],
            row_of[c] << 3,
        ).astype(np.int32)

    rows = np.zeros((m, 16), F)
    rows[:, 0:3] = bvh.node_min[left]
    rows[:, 3:6] = bvh.node_max[left]
    rows[:, 6:9] = bvh.node_min[right]
    # slot 14: split axis (argmax child-center separation) — drives
    # static near-first ordering in the Pallas walk
    cl = (bvh.node_min[left] + bvh.node_max[left]) * 0.5
    cr = (bvh.node_min[right] + bvh.node_max[right]) * 0.5
    axis = np.argmax(np.abs(cr - cl), axis=1).astype(np.int32)
    rows[:, 14] = axis.view(F)
    rows[:, 9:12] = bvh.node_max[right]
    rows[:, 12] = child_metas(left).view(F)
    rows[:, 13] = child_metas(right).view(F)
    root_meta = 0  # root is internal -> row 0 (preorder)

    # tree depth bounds the traversal stack (static, per scene); children
    # always have larger preorder indices so one forward sweep suffices
    depth = np.zeros(n_nodes, np.int64)
    # preorder: a parent precedes its children, so one forward sweep works
    for i in ints:
        l = i + 1
        r = int(bvh.skip[l])
        depth[l] = depth[r] = depth[i] + 1
    maxd = int(depth.max()) + 1
    rows = _pad_rows(rows, _round_up(m, 8))
    return rows, root_meta, maxd


def _bvh4_layout(bvh):
    """Collapse the BVH2 into 4-wide records for the Pallas quad walk.

    Each BVH4 record covers two BVH2 levels: its children are the 2-4
    grandchildren (or leaf children) of a BVH2 internal node. Record = 32
    f32: 4 child AABBs (24), 4 child metas (leaf -> (first<<3)|count,
    internal -> bvh4_row<<3, -1 -> absent), packed order axes, pad.
    Returns (records (K, 32) f32, root_meta4, stack_bound).
    """
    count = bvh.count
    if bvh.prim_order.shape[0] == 0:
        return np.zeros((4, 32), F), -1, 4
    if count[0] > 0:  # single-leaf tree
        root_meta = (int(bvh.left_first[0]) << 3) | int(count[0])
        return np.zeros((4, 32), F), root_meta, 4

    left_of = lambda i: i + 1  # noqa: E731
    right_of = lambda i: int(bvh.skip[i + 1])  # noqa: E731

    def split_axis(i):
        l, r = left_of(i), right_of(i)
        cl = (bvh.node_min[l] + bvh.node_max[l]) * 0.5
        cr = (bvh.node_min[r] + bvh.node_max[r]) * 0.5
        return int(np.argmax(np.abs(cr - cl)))

    # BFS over BVH2 internals that become BVH4 records
    row_of = {}
    order = []

    def visit(i):
        row_of[i] = len(order)
        order.append(i)

    visit(0)
    qi = 0
    children_of = {}
    while qi < len(order):
        n = order[qi]
        qi += 1
        kids = []  # (bvh2 node id, is_leaf)
        for c in (left_of(n), right_of(n)):
            if count[c] > 0:
                kids.append((c, True))
            else:
                kids.append((left_of(c), count[left_of(c)] > 0))
                kids.append((right_of(c), count[right_of(c)] > 0))
        children_of[n] = kids
        for c, is_leaf in kids:
            if not is_leaf and c not in row_of:
                visit(c)

    k = len(order)
    recs = np.zeros((k, 32), F)
    metas = np.full((k, 4), -1, np.int32)
    axes = np.zeros(k, np.int32)
    for r, n in enumerate(order):
        kids = children_of[n]
        # order axes: top split + per-half splits (identity when a half
        # was not collapsed)
        a_top = split_axis(n)
        l, rr = left_of(n), right_of(n)
        a_l = split_axis(l) if count[l] == 0 else a_top
        a_r = split_axis(rr) if count[rr] == 0 else a_top
        nleft = 2 if count[l] == 0 else 1
        axes[r] = (
            a_top | (a_l << 2) | (a_r << 4) | (len(kids) << 6) | (nleft << 9)
        )
        for j, (c, is_leaf) in enumerate(kids):
            recs[r, j * 6 : j * 6 + 3] = bvh.node_min[c]
            recs[r, j * 6 + 3 : j * 6 + 6] = bvh.node_max[c]
            if is_leaf:
                metas[r, j] = (int(bvh.left_first[c]) << 3) | int(count[c])
            else:
                metas[r, j] = row_of[c] << 3
        # when the left/right half was NOT collapsed (child was a leaf),
        # kids has fewer than 4 entries; j indexes stay compact and the
        # in-kernel order logic uses the child count
    recs[:, 24:28] = metas.view(F)
    recs[:, 28] = axes.view(F)

    # stack bound: ≤3 pushes per record level; record depth ≈ ceil(d2/2)
    d2 = 1
    depth = {0: 0}
    for n in order:
        for c, is_leaf in children_of[n]:
            if not is_leaf:
                depth[c] = depth[n] + 1
                d2 = max(d2, depth[c] + 1)
    bound = 3 * (d2 + 2)
    pad = -k % 4
    if pad:
        recs = np.concatenate([recs, np.zeros((pad, 32), F)])
    return recs, 0, bound


def _rowrec_layout(recs: np.ndarray, tri_pack: np.ndarray, root_meta4: int):
    """One quad record per 128-lane row + 8-aligned leaf triangle rows.

    A dynamic-sublane row read replaces the per-visit lax.switch record
    select (measured ~144 ns per switch by the round-2 in-situ probes —
    the dominant share of the kernel's per-visit cost), and each leaf
    phase reads ONE row and slices its tri slots statically instead of
    issuing 4 more switches. Slot field 9 carries the original tri index
    so winners keep global prim numbering.

    Returns (quad_rows (K, 128) f32, tri_rows (L, 128) f32, root_meta4r).
    """
    k = recs.shape[0]
    rows = np.zeros((k, 128), F)
    rows[:, :32] = recs
    metas = recs[:, 24:28].view(np.int32).copy()

    tri_rows = []

    def leaf_row(meta: int) -> int:
        first, count = meta >> 3, meta & 7
        row = np.zeros(128, F)
        for s in range(count):
            row[s * 16 : s * 16 + 9] = tri_pack[first + s, :9]
            row[s * 16 + 9] = np.int32(first + s).view(F)
        tri_rows.append(row)
        return ((len(tri_rows) - 1) << 3) | count

    if root_meta4 >= 0 and (root_meta4 & 7):
        root_meta4 = leaf_row(root_meta4)
    else:
        for r in range(k):
            for j in range(4):
                m = int(metas[r, j])
                if m >= 0 and (m & 7):
                    metas[r, j] = leaf_row(m)
        rows[:, 24:28] = metas.view(F)

    if not tri_rows:
        tri_rows.append(np.zeros(128, F))
    tri_rows = np.stack(tri_rows).astype(F)
    tri_rows = _pad_rows(tri_rows, _round_up(tri_rows.shape[0], 8))
    rows = _pad_rows(rows, _round_up(rows.shape[0], 8))
    return rows, tri_rows, int(root_meta4)


LEAF8_MAX = 8      # max tris per merged leaf child (= one tri-group block)
N8_PER_BLOCK = 16  # nodes per node block (16 lane groups of 8 lanes)
G8_PER_BLOCK = 12  # tri groups per (8, 128) tri block (10 lanes each)


def _t8_width() -> int:
    """Transposed-node child count (sublane blocks: 8 = one, 16 = two,
    32 = four)."""
    # 16 wins on the honest (post-recalibration) renderer with NW=1/R=4:
    # round-3 sweep, docs/PERF_LOG.md "Round-3 knob re-sweep"
    w = int(os.environ.get("TPU_RT_T8_W", "16"))
    assert w in (8, 16, 32)
    return w


def _t8_lg() -> int:
    """Tris per merged bvh8t leaf group (sublane rows per tri block).

    Default 16 (round-3 A/B: cbbunny 4.85 -> 5.50 Mrays/s): halves the
    number of leaf iterations (each ~2.2-2.6us of serial per-iteration
    wall, docs/PERF_LOG.md round 3) at the cost of testing up to 2x the
    tris per visited group."""
    lg = int(os.environ.get("TPU_RT_T8_LG", "16"))
    assert lg in (8, 16, 32)
    return lg


def _t8_fld(w: int) -> int:
    """Meta bit-field width for child counts (ni/nl can reach 32 at
    w=32, so the count field grows to 6 bits there; 5 otherwise keeps
    the w=8/16 layouts byte-identical to round 2)."""
    return 6 if w == 32 else 5


def _bvh8t_layout(bvh, tri_pack):
    """Transposed 8-wide BVH for the single-drain Pallas walk (`bvh8t`).

    Round-2 structural redesign of the traversal kernel data layout. The
    measured per-visit wall (~0.7 us, docs/PERF_LOG.md) is the *latency* of
    the serial vector->scalar round trips each visit makes, so this layout
    is built so a visit needs exactly ONE vector->scalar crossing (the
    packed child-hit vote) and zero scalar extracts for geometry:

    - children live in SUBLANES: each BVH8 node is an 8-lane group of a
      (8, 128) block (sublane = child slot; lanes +0..2 child box min,
      +3..5 max). Slab tests become pure (8, 128) vector ops — box coords
      are column broadcasts, ray data are row broadcasts.
    - per-node scalars (child base, leaf base, counts) live in a separate
      int32 table read from SMEM (scalar memory — no VPU sync), packed as
      meta0 = child_base<<5|n_internal, meta1 = leaf_base<<5|n_leaf.
    - internal children of a node get CONTIGUOUS node ids, so the stack
      holds (base, pending-bitmask) entries and a pop is ffs + clear — no
      per-slot select chains.
    - leaf children are merged BVH2 subtrees of <= LEAF8_MAX prims (prim
      ranges are contiguous by construction of the in-place partition in
      accel/bvh.py) stored as one transposed tri group each: tri slot in
      sublane, lanes +0..2 p0, +3..5 e1, +6..8 e2, +9 tri id bits. A
      node's leaf groups are contiguous (leaf_base + j) and sit in child
      slots 7-j so their box-hit masks are static sublane slices.
    - empty child slots get NaN boxes (slab comparisons all false).

    Node blocks pack 16 nodes per (8, 128) block (8 lanes each); tri
    blocks pack 12 groups per block (10 lanes each). The kernel reads a
    block row-range and rotates the group's lanes to 0 with a dynamic
    pltpu.roll.

    Role replaced: OptiX hardware BVH traversal data
    (reference csrc/host/scene.cu:89-160).

    Returns (node_blocks (B*8, 128) f32, meta (N8, 2) i32,
             tri_blocks (G*8, 128) f32, stack_bound).
    """
    w = _t8_width()
    lg = _t8_lg()
    count = bvh.count
    n2 = count.shape[0]
    empty = (np.full((w, 128), np.nan, F), np.zeros((1, 2), np.int32),
             np.zeros((lg, 128), F), 4)
    if bvh.prim_order.shape[0] == 0:
        return empty

    # subtree prim ranges via preorder slices: subtree(i) = nodes
    # [i, skip[i]); prim ranges of leaves are contiguous ascending
    leaf_idx = np.nonzero(count > 0)[0]
    lf = bvh.left_first.astype(np.int64)
    assert np.all(
        lf[leaf_idx][1:] == lf[leaf_idx][:-1] + count[leaf_idx][:-1]
    ), "BVH prim ranges not contiguous in preorder"
    csum = np.concatenate([[0], np.cumsum(count)]).astype(np.int64)
    total = csum[bvh.skip] - csum[np.arange(n2)]
    pos = np.searchsorted(leaf_idx, np.arange(n2))
    first = lf[leaf_idx[np.minimum(pos, len(leaf_idx) - 1)]]

    ext = np.maximum(bvh.node_max - bvh.node_min, 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]

    skip = bvh.skip

    def mergeable(i):
        return count[i] > 0 or total[i] <= lg

    # BFS collapse; node id = queue position; internal children contiguous
    queue = [0]
    qi = 0
    node_slots = []   # per node: (internal bvh2 ids, leaf bvh2 ids)
    child_base = []
    depth = [0]
    maxd = 0
    while qi < len(queue):
        r = queue[qi]
        qi += 1
        maxd = max(maxd, depth[qi - 1])
        if mergeable(r):  # only possible for the root
            node_slots.append(([], [r]))
            child_base.append(0)
            continue
        cut = [r + 1, int(skip[r + 1])]
        while len(cut) < w:
            exp = [c for c in cut if not mergeable(c)]
            if not exp:
                break
            j = max(exp, key=lambda c: (area[c], -c))
            p = cut.index(j)
            cut[p:p + 1] = [j + 1, int(skip[j + 1])]
        ints = [c for c in cut if not mergeable(c)]
        lvs = [c for c in cut if mergeable(c)]
        child_base.append(len(queue))
        queue.extend(ints)
        depth.extend([depth[qi - 1] + 1] * len(ints))
        node_slots.append((ints, lvs))
    n8 = len(queue)

    nb = _round_up(n8, N8_PER_BLOCK) // N8_PER_BLOCK
    node_blocks = np.full((nb * w, 128), np.nan, F)
    meta = np.zeros((n8, 2), np.int32)
    groups = []
    fld = _t8_fld(w)
    for nid in range(n8):
        ints, lvs = node_slots[nid]
        ni, nl = len(ints), len(lvs)
        lb = len(groups)
        meta[nid, 0] = (child_base[nid] << fld) | ni
        meta[nid, 1] = (lb << fld) | nl
        b, g = divmod(nid, N8_PER_BLOCK)
        for s, c in enumerate(ints):
            node_blocks[b * w + s, g * 8:g * 8 + 3] = bvh.node_min[c]
            node_blocks[b * w + s, g * 8 + 3:g * 8 + 6] = bvh.node_max[c]
        for j, c in enumerate(lvs):
            s = w - 1 - j
            node_blocks[b * w + s, g * 8:g * 8 + 3] = bvh.node_min[c]
            node_blocks[b * w + s, g * 8 + 3:g * 8 + 6] = bvh.node_max[c]
            groups.append((int(first[c]), int(total[c])))

    gb = _round_up(max(1, len(groups)), G8_PER_BLOCK) // G8_PER_BLOCK
    tri_blocks = np.zeros((gb * lg, 128), F)
    for q, (fst, cnt) in enumerate(groups):
        b, j = divmod(q, G8_PER_BLOCK)
        p0 = tri_pack[fst:fst + cnt, 0:3]
        tri_blocks[b * lg:b * lg + cnt, j * 10:j * 10 + 3] = p0
        tri_blocks[b * lg:b * lg + cnt, j * 10 + 3:j * 10 + 6] = (
            tri_pack[fst:fst + cnt, 3:6] - p0)
        tri_blocks[b * lg:b * lg + cnt, j * 10 + 6:j * 10 + 9] = (
            tri_pack[fst:fst + cnt, 6:9] - p0)
        tri_blocks[b * lg:b * lg + cnt, j * 10 + 9] = (
            np.arange(fst, fst + cnt, dtype=np.int32).view(F))

    return node_blocks, meta, tri_blocks, maxd + 3


# VMEM budget for one bvh8t chunk's resident tables (kernel stages node +
# tri blocks into VMEM whole; keep well under the ~16 MB/core of VMEM so
# ray columns and outputs fit alongside)
T8_CHUNK_BYTES = 6 * 1024 * 1024


def _bvh2_slice(bvh, r: int):
    """Self-contained LinearBVH view of subtree [r, skip[r]) (global prim
    numbering preserved — leaf left_first stays an index into the full
    prim-ordered triangle tables)."""
    from ..accel.bvh import LinearBVH

    s = int(bvh.skip[r])
    return LinearBVH(
        node_min=bvh.node_min[r:s],
        node_max=bvh.node_max[r:s],
        left_first=bvh.left_first[r:s],
        count=bvh.count[r:s],
        skip=np.clip(bvh.skip[r:s] - r, 0, s - r).astype(np.int32),
        prim_order=bvh.prim_order,
    )


def _t8_chunk_layout(bvh, tri_pack, budget=None):
    """Partition the BVH2 into subtree chunks whose bvh8t tables each fit
    the VMEM budget; each chunk becomes an independent transposed accel
    traversed as one masked pass (pseudo-BLAS with identity transform).

    This is the scalability path for scenes whose full tables exceed VMEM
    (VERDICT r1 item 4): the union of chunk passes is the exact closest
    hit because t_best chains across passes, and each pass is gated by the
    chunk root AABB slab so far-away tiles exit at the root.

    Returns list of (node_blocks, meta, tri_blocks, stack, root_min,
    root_max) — empty list if the whole scene fits (caller uses the single
    resident layout).
    """
    if budget is None:
        budget = int(os.environ.get("TPU_RT_T8_CHUNK_BYTES", T8_CHUNK_BYTES))
    # conservative per-subtree byte estimate: tri groups dominate
    csum = np.concatenate([[0], np.cumsum(bvh.count)]).astype(np.int64)

    def est_bytes(r):
        s = int(bvh.skip[r])
        n_t = int(csum[s] - csum[r])
        n_nodes = s - r
        return n_t * 80 + n_nodes * 40

    if est_bytes(0) <= budget:
        return []

    def partition(b):
        parts = []
        stack = [0]
        while stack:
            r = stack.pop()
            if bvh.count[r] > 0 or est_bytes(r) <= b:
                parts.append(r)
            else:
                stack.append(int(bvh.skip[r + 1]))
                stack.append(r + 1)
        return parts

    # The 80 B/tri estimate under-counts fragmented leaves (merged t8 leaf
    # groups of 1-2 prims cost up to ~320 B/tri), so the built chunk can
    # exceed the estimate; retry the partition at a halved budget instead
    # of crashing scene compilation (ADVICE r2).
    split_budget = budget
    for _ in range(4):
        out = []
        ok = True
        for r in partition(split_budget):
            sl = _bvh2_slice(bvh, r)
            nodes, meta, tris, stk = _bvh8t_layout(sl, tri_pack)
            if (nodes.size + tris.size) * 4 > 1.5 * budget:
                ok = False
                break
            out.append((nodes, meta, tris, stk,
                        bvh.node_min[r].copy(), bvh.node_max[r].copy()))
        if ok:
            return out
        split_budget //= 2
    raise RuntimeError(
        "t8 chunk layout could not fit the VMEM budget even after 4 "
        "budget halvings; fall back with TPU_RT_PALLAS=0 (XLA walk)"
    )


def _pad_rows(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    if a.shape[0] >= n:
        return a
    pad = np.full((n - a.shape[0], *a.shape[1:]), fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


def _round_up(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


def _flatten_primitives(scene: Scene):
    """Yield (BasicPrimitive, prim_index, composed world Transform)."""
    out = []

    def walk(agg_idx: int, outer: Transform):
        for i in range(len(scene.get_aggregate(agg_idx).children)):
            idx, t = scene.get_descendant(agg_idx, i)
            composed = t.compose(outer)
            prim = scene.get_primitive(idx)
            if isinstance(prim, BasicPrimitive):
                out.append((prim, idx, composed))
            else:
                walk(idx, composed)

    walk(scene.root_index(), Transform.identity())
    return out


def _normal_matrix(t: Transform) -> np.ndarray:
    return t.inverse[:3, :3].T.copy()


def _build_mip_pyramid(data: np.ndarray):
    """Box-filter mip pyramid over a pow2-square padded copy.

    The reference uses a Lanczos3 pyramid (texture.rs:114-165); box filtering
    is a placeholder with the same level structure (refine later).
    """
    h, w = data.shape[:2]
    size = 1 << int(np.ceil(np.log2(max(h, w, 1))))
    levels = []
    if (h, w) != (size, size):
        ys = (np.arange(size) * h // size).clip(0, h - 1)
        xs = (np.arange(size) * w // size).clip(0, w - 1)
        cur = data[ys][:, xs]
    else:
        cur = data
    levels.append(cur.astype(F))
    while cur.shape[0] > 1:
        cur = (
            cur[0::2, 0::2] + cur[1::2, 0::2] + cur[0::2, 1::2] + cur[1::2, 1::2]
        ) * 0.25
        levels.append(cur.astype(F))
    return levels


class _TriAccel(NamedTuple):
    """Host-side accel tables for one triangle set (world soup or one BLAS)."""

    tri_p0: np.ndarray
    tri_p1: np.ndarray
    tri_p2: np.ndarray
    tri_n0: np.ndarray
    tri_n1: np.ndarray
    tri_n2: np.ndarray
    tri_uv0: np.ndarray
    tri_uv1: np.ndarray
    tri_uv2: np.ndarray
    tri_mat: np.ndarray
    tri_light: np.ndarray
    tri_has_n: np.ndarray
    tri_has_uv: np.ndarray
    bvh_min: np.ndarray
    bvh_max: np.ndarray
    bvh_first: np.ndarray
    bvh_count: np.ndarray
    bvh_skip: np.ndarray
    bvh_nodes: np.ndarray
    tri_pack: np.ndarray
    bvh_nodes_pk: np.ndarray
    tri_pack_pk: np.ndarray
    bvh2_rows: np.ndarray
    bvh2_rows_pk: np.ndarray
    bvh4_recs_pk: np.ndarray
    n_tris: int
    n_nodes: int
    root_meta: int
    bvh2_depth: int
    root_meta4: int
    bvh4_stack: int
    root_min: np.ndarray
    root_max: np.ndarray
    bvh4_rows: np.ndarray   # (K, 128) one quad record per row
    tri_rows: np.ndarray    # (L, 128) 8-aligned leaf tri rows
    root_meta4r: int        # root meta in rowrec leaf numbering
    t8_nodes: np.ndarray    # (B*8, 128) transposed BVH8 node blocks
    t8_meta: np.ndarray     # (N8, 2) i32 per-node scalars (SMEM table)
    t8_tris: np.ndarray     # (G*8, 128) transposed tri-group blocks
    t8_stack: int           # stack bound for the bvh8t walk
    t8_chunks: list         # VMEM-sized subtree accels (big scenes)


def _accel_tables(
    tri_p0, tri_p1, tri_p2, tri_n0, tri_n1, tri_n2,
    tri_uv0, tri_uv1, tri_uv2, tri_mat, tri_light, tri_has_n, tri_has_uv,
) -> _TriAccel:
    """Build every traversal layout over one triangle set (BVH order)."""
    n_tris = tri_p0.shape[0]
    prim_min = np.minimum(np.minimum(tri_p0, tri_p1), tri_p2)
    prim_max = np.maximum(np.maximum(tri_p0, tri_p1), tri_p2)
    bvh = build_bvh(prim_min, prim_max)
    order = bvh.prim_order
    if n_tris:
        tri_p0, tri_p1, tri_p2 = tri_p0[order], tri_p1[order], tri_p2[order]
        tri_n0, tri_n1, tri_n2 = tri_n0[order], tri_n1[order], tri_n2[order]
        tri_uv0, tri_uv1, tri_uv2 = tri_uv0[order], tri_uv1[order], tri_uv2[order]
        tri_mat, tri_light = tri_mat[order], tri_light[order]
        tri_has_n, tri_has_uv = tri_has_n[order], tri_has_uv[order]

    t_pad = _round_up(n_tris, 8)
    tri_p0 = _pad_rows(tri_p0, t_pad)
    tri_p1 = _pad_rows(tri_p1, t_pad)
    tri_p2 = _pad_rows(tri_p2, t_pad)
    tri_n0 = _pad_rows(tri_n0, t_pad)
    tri_n1 = _pad_rows(tri_n1, t_pad)
    tri_n2 = _pad_rows(tri_n2, t_pad)
    tri_uv0 = _pad_rows(tri_uv0, t_pad)
    tri_uv1 = _pad_rows(tri_uv1, t_pad)
    tri_uv2 = _pad_rows(tri_uv2, t_pad)
    tri_mat = _pad_rows(tri_mat, t_pad)
    tri_light = _pad_rows(tri_light, t_pad, fill=-1)
    tri_has_n = _pad_rows(tri_has_n, t_pad)
    tri_has_uv = _pad_rows(tri_has_uv, t_pad)

    n_nodes = bvh.n_nodes
    nd_pad = _round_up(n_nodes, 8)
    bvh_min = _pad_rows(bvh.node_min, nd_pad, fill=1.0)
    bvh_max = _pad_rows(bvh.node_max, nd_pad, fill=-1.0)
    bvh_first = _pad_rows(bvh.left_first, nd_pad)
    bvh_count = _pad_rows(bvh.count, nd_pad)
    bvh_skip = _pad_rows(bvh.skip, nd_pad, fill=n_nodes)

    # packed node layout: a single 8-wide gather per traversal step
    meta1 = (bvh_first.astype(np.int64) << 3) | bvh_count.astype(np.int64)
    bvh_nodes = np.concatenate(
        [
            bvh_min, bvh_max,
            meta1.astype(np.int32).view(F)[:, None],
            bvh_skip.view(F)[:, None],
        ],
        axis=1,
    ).astype(F)
    tri_pack = np.concatenate([tri_p0, tri_p1, tri_p2], axis=1).astype(F)

    from ..ops.traverse_pallas import pack_tables

    bvh_nodes_pk, tri_pack_pk = pack_tables(bvh_nodes, tri_pack)

    bvh2_rows, root_meta, bvh2_depth = _child_pair_layout(bvh)
    bvh2_rows_pk = bvh2_rows.reshape(-1, 8 * 16)  # 8 records of 16 f32
    bvh4_recs, root_meta4, bvh4_stack = _bvh4_layout(bvh)
    bvh4_recs_pk = bvh4_recs.reshape(-1, 4 * 32)  # 4 records of 32 f32
    bvh4_rows, tri_rows, root_meta4r = _rowrec_layout(
        bvh4_recs, tri_pack, root_meta4
    )
    t8_nodes, t8_meta, t8_tris, t8_stack = _bvh8t_layout(bvh, tri_pack)
    t8_chunks = _t8_chunk_layout(bvh, tri_pack)

    if n_tris:
        root_min = prim_min.min(axis=0).astype(F)
        root_max = prim_max.max(axis=0).astype(F)
    else:
        root_min = np.full(3, np.inf, F)
        root_max = np.full(3, -np.inf, F)

    return _TriAccel(
        tri_p0, tri_p1, tri_p2, tri_n0, tri_n1, tri_n2,
        tri_uv0, tri_uv1, tri_uv2, tri_mat, tri_light, tri_has_n, tri_has_uv,
        bvh_min, bvh_max, bvh_first, bvh_count, bvh_skip,
        bvh_nodes, tri_pack, bvh_nodes_pk, tri_pack_pk,
        bvh2_rows, bvh2_rows_pk, bvh4_recs_pk,
        int(n_tris), int(n_nodes), int(root_meta), int(bvh2_depth),
        int(root_meta4), int(bvh4_stack), root_min, root_max,
        bvh4_rows, tri_rows, int(root_meta4r),
        t8_nodes, t8_meta, t8_tris, int(t8_stack), t8_chunks,
    )


def _tri_shade_rows(a: _TriAccel) -> np.ndarray:
    """(T, 32) single-gather shading rows from accel-ordered tri arrays."""
    sh = np.zeros((a.tri_p0.shape[0], 32), F)
    sh[:, 0:3] = a.tri_p0
    sh[:, 3:6] = a.tri_p1
    sh[:, 6:9] = a.tri_p2
    sh[:, 9:12] = a.tri_n0
    sh[:, 12:15] = a.tri_n1
    sh[:, 15:18] = a.tri_n2
    sh[:, 18:20] = a.tri_uv0
    sh[:, 20:22] = a.tri_uv1
    sh[:, 22:24] = a.tri_uv2
    sh[:, 24] = a.tri_mat.astype(np.int32).view(F)
    sh[:, 25] = a.tri_light.astype(np.int32).view(F)
    sh[:, 26] = a.tri_has_n.astype(np.int32).view(F)
    sh[:, 27] = a.tri_has_uv.astype(np.int32).view(F)
    return sh


def _mesh_tri_arrays(mesh, mat_id: int, light_id: int):
    """Object-space per-triangle SoA arrays of one mesh (no transform)."""
    tri = mesh.tris.astype(np.int64)
    nt = tri.shape[0]
    v = mesh.vertices.astype(F)
    p0, p1, p2 = v[tri[:, 0]], v[tri[:, 1]], v[tri[:, 2]]
    if mesh.has_normals:
        n = mesh.normals.astype(F)
        n0, n1, n2 = n[tri[:, 0]], n[tri[:, 1]], n[tri[:, 2]]
        has_n = np.ones(nt, bool)
    else:
        n0 = n1 = n2 = np.zeros((nt, 3), F)
        has_n = np.zeros(nt, bool)
    if mesh.has_uvs:
        uv = mesh.uvs.astype(F)
        uv0, uv1, uv2 = uv[tri[:, 0]], uv[tri[:, 1]], uv[tri[:, 2]]
        has_uv = np.ones(nt, bool)
    else:
        uv0 = uv1 = uv2 = np.zeros((nt, 2), F)
        has_uv = np.zeros(nt, bool)
    return (
        p0, p1, p2, n0, n1, n2, uv0, uv1, uv2,
        np.full(nt, mat_id, np.int32), np.full(nt, light_id, np.int32),
        has_n, has_uv,
    )


# shared meshes below this size are cheaper to duplicate world-space than to
# pay an extra per-instance kernel dispatch
INSTANCE_MIN_TRIS = int(os.environ.get("TPU_RT_INSTANCE_MIN_TRIS", "16"))


def compile_scene(scene: Scene) -> DeviceScene:
    prims = _flatten_primitives(scene)

    # ---------------- triangles + spheres
    tp0, tp1, tp2 = [], [], []
    tn0, tn1, tn2 = [], [], []
    tuv0, tuv1, tuv2 = [], [], []
    tmat, tlight, thasn, thasuv = [], [], [], []
    sph = []

    # shared-prim detection: a BasicPrimitive reached through >1 transform
    # chain is an INSTANCE group — its mesh is built once as an object-space
    # BLAS and traversed per instance with transformed rays (reference:
    # accel.rs:119-214 nested BVHs / scene.cu:162-250 IAS over shared GAS).
    # Emissive prims and tiny meshes are baked world-space instead.
    occ_count: dict = {}
    for _, prim_idx, _ in prims:
        occ_count[prim_idx] = occ_count.get(prim_idx, 0) + 1
    inst_groups: dict = {}  # prim_idx -> [transforms]

    for prim, prim_idx, t in prims:
        mat_id = prim.material if prim.material is not None else 0
        light_id = prim.area_light if prim.area_light is not None else -1
        shape = prim.shape
        if isinstance(shape, Sphere):
            sph.append((shape, t, mat_id, light_id))
            continue
        assert isinstance(shape, TriangleMesh)
        if (
            occ_count[prim_idx] > 1
            and prim.area_light is None
            and shape.mesh.tris.shape[0] >= INSTANCE_MIN_TRIS
        ):
            inst_groups.setdefault(prim_idx, (prim, []))[1].append(t)
            continue
        mesh = shape.mesh
        nt = mesh.tris.shape[0]
        if nt == 0:
            continue
        m = t.forward
        verts_h = mesh.vertices @ m[:3, :3].T + m[:3, 3]
        tri = mesh.tris.astype(np.int64)
        tp0.append(verts_h[tri[:, 0]])
        tp1.append(verts_h[tri[:, 1]])
        tp2.append(verts_h[tri[:, 2]])
        if mesh.has_normals:
            nm = _normal_matrix(t)
            norms = mesh.normals @ nm.T
            tn0.append(norms[tri[:, 0]])
            tn1.append(norms[tri[:, 1]])
            tn2.append(norms[tri[:, 2]])
            thasn.append(np.ones(nt, bool))
        else:
            z = np.zeros((nt, 3), F)
            tn0.append(z)
            tn1.append(z)
            tn2.append(z)
            thasn.append(np.zeros(nt, bool))
        if mesh.has_uvs:
            tuv0.append(mesh.uvs[tri[:, 0]])
            tuv1.append(mesh.uvs[tri[:, 1]])
            tuv2.append(mesh.uvs[tri[:, 2]])
            thasuv.append(np.ones(nt, bool))
        else:
            z = np.zeros((nt, 2), F)
            tuv0.append(z)
            tuv1.append(z)
            tuv2.append(z)
            thasuv.append(np.zeros(nt, bool))
        tmat.append(np.full(nt, mat_id, np.int32))
        tlight.append(np.full(nt, light_id, np.int32))

    def cat(parts, shape, dtype=F):
        if parts:
            return np.concatenate(parts, axis=0).astype(dtype)
        return np.zeros((0, *shape), dtype)

    acc = _accel_tables(
        cat(tp0, (3,)), cat(tp1, (3,)), cat(tp2, (3,)),
        cat(tn0, (3,)), cat(tn1, (3,)), cat(tn2, (3,)),
        cat(tuv0, (2,)), cat(tuv1, (2,)), cat(tuv2, (2,)),
        cat(tmat, (), np.int32), cat(tlight, (), np.int32),
        cat(thasn, (), bool), cat(thasuv, (), bool),
    )
    n_tris = acc.n_tris
    (tri_p0, tri_p1, tri_p2, tri_n0, tri_n1, tri_n2,
     tri_uv0, tri_uv1, tri_uv2, tri_mat, tri_light,
     tri_has_n, tri_has_uv) = acc[:13]
    (bvh_min, bvh_max, bvh_first, bvh_count, bvh_skip, bvh_nodes, tri_pack,
     bvh_nodes_pk, tri_pack_pk, bvh2_rows, bvh2_rows_pk,
     bvh4_recs_pk) = acc[13:25]
    n_nodes, root_meta, bvh2_depth = acc.n_nodes, acc.root_meta, acc.bvh2_depth
    root_meta4, bvh4_stack = acc.root_meta4, acc.bvh4_stack

    # ---------------- shared BLAS + instance tables
    blas_accels: list[_TriAccel] = []
    blas_meta = []
    instances = []          # (blas_id, vtri_base placeholder, n_tris, shade_off)
    inst_mats = []          # (o2w 4x4, w2o 4x4)
    inst_aabbs = []         # (min3, max3) world
    blas_shade_rows = []
    shade_off = _round_up(n_tris, 8)  # main tri_shade rows come first (padded)
    for prim_idx, (prim, transforms) in inst_groups.items():
        mat_id = prim.material if prim.material is not None else 0
        b = _accel_tables(*_mesh_tri_arrays(prim.shape.mesh, mat_id, -1))
        blas_id = len(blas_accels)
        blas_accels.append(b)
        blas_meta.append((b.n_tris, b.root_meta, b.bvh2_depth,
                          b.root_meta4, b.bvh4_stack, b.n_nodes,
                          b.root_meta4r, b.t8_stack))
        blas_shade_rows.append(_tri_shade_rows(b))
        corners = np.array(
            [[b.root_min[0] if sx < 0 else b.root_max[0],
              b.root_min[1] if sy < 0 else b.root_max[1],
              b.root_min[2] if sz < 0 else b.root_max[2]]
             for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)], F
        )
        for t in transforms:
            m = t.forward
            wc = corners @ m[:3, :3].T + m[:3, 3]
            inst_aabbs.append((wc.min(axis=0), wc.max(axis=0)))
            inst_mats.append((m.astype(F), t.inverse.astype(F)))
            instances.append((blas_id, 0, b.n_tris, shade_off))
        shade_off += blas_shade_rows[-1].shape[0]

    # ---------------- spheres
    n_spheres = len(sph)
    s_pad = _round_up(n_spheres, 8) if n_spheres else 0
    sph_center = np.zeros((s_pad, 3), F)
    sph_radius = np.zeros(s_pad, F)
    sph_o2w = np.tile(np.eye(4, dtype=F), (s_pad, 1, 1))
    sph_w2o = np.tile(np.eye(4, dtype=F), (s_pad, 1, 1))
    sph_mat = np.zeros(s_pad, np.int32)
    sph_light = np.full(s_pad, -1, np.int32)
    for i, (shape, t, mat_id, light_id) in enumerate(sph):
        sph_center[i] = shape.center
        sph_radius[i] = shape.radius
        sph_o2w[i] = t.forward
        sph_w2o[i] = t.inverse
        sph_mat[i] = mat_id
        sph_light[i] = light_id

    # virtual-triangle prim id ranges: [0, n_tris) main world tris,
    # [n_tris, n_tris + s_pad) spheres, then one contiguous block per
    # instance (decoded back to shared BLAS rows in hit_details)
    inst_vtri_base0 = n_tris + s_pad
    base = inst_vtri_base0
    for i, (blas_id, _, nt_b, so) in enumerate(instances):
        instances[i] = (blas_id, base, nt_b, so)
        base += nt_b

    # ---------------- scene bounds (world AABB of all geometry)
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    if n_tris:
        lo = np.minimum(lo, acc.root_min)
        hi = np.maximum(hi, acc.root_max)
    for amin, amax in inst_aabbs:
        lo = np.minimum(lo, amin)
        hi = np.maximum(hi, amax)
    for i in range(n_spheres):
        c, r = sph_center[i], sph_radius[i]
        corners = c[None, :] + r * np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)], F
        )
        m = sph_o2w[i]
        wc = corners @ m[:3, :3].T + m[:3, 3]
        lo = np.minimum(lo, wc.min(axis=0))
        hi = np.maximum(hi, wc.max(axis=0))
    if not np.all(np.isfinite(lo)):
        lo, hi = np.zeros(3), np.zeros(3)
    bounds_center = ((lo + hi) * 0.5).astype(F)
    bounds_radius = F(np.linalg.norm(hi - lo) * 0.5)

    # ---------------- materials
    n_mats = max(1, len(scene.materials))
    mat_kind = np.zeros(n_mats, np.int32)
    mat_tex = np.full((n_mats, 5), -1, np.int32)
    mat_remap = np.zeros(n_mats, bool)
    kinds_present = set()
    for i, m in enumerate(scene.materials):
        if isinstance(m, Diffuse):
            mat_kind[i] = MAT_DIFFUSE
            mat_tex[i, 0] = m.albedo
        elif isinstance(m, SmoothDielectric):
            mat_kind[i] = MAT_SMOOTH_DIELECTRIC
            mat_tex[i, 0] = m.eta
        elif isinstance(m, SmoothConductor):
            mat_kind[i] = MAT_SMOOTH_CONDUCTOR
            mat_tex[i, 0] = m.eta
            mat_tex[i, 1] = m.kappa
        elif isinstance(m, RoughDielectric):
            mat_kind[i] = MAT_ROUGH_DIELECTRIC
            mat_tex[i, 0] = m.eta
            mat_tex[i, 2] = m.roughness
            mat_remap[i] = m.remap_roughness
        elif isinstance(m, RoughConductor):
            mat_kind[i] = MAT_ROUGH_CONDUCTOR
            mat_tex[i, 0] = m.eta
            mat_tex[i, 1] = m.kappa
            mat_tex[i, 2] = m.roughness
            mat_remap[i] = m.remap_roughness
        elif isinstance(m, CoatedDiffuse):
            mat_kind[i] = MAT_COATED_DIFFUSE
            mat_tex[i, 0] = m.diffuse_albedo
            mat_tex[i, 1] = m.dielectric_eta
            mat_tex[i, 2] = (
                m.dielectric_roughness if m.dielectric_roughness is not None else -1
            )
            mat_tex[i, 3] = m.thickness
            mat_tex[i, 4] = m.coat_albedo
            mat_remap[i] = m.dielectric_remap_roughness
        else:
            raise TypeError(f"unknown material: {m}")
        kinds_present.add(int(mat_kind[i]))
    if not scene.materials:
        kinds_present.add(MAT_DIFFUSE)

    # ---------------- images (mip atlas)
    trilinear_images = set()
    any_nearest = False
    for t in scene.textures:
        if isinstance(t, ImageTexture) and t.sampler.filter == FilterMode.TRILINEAR:
            trilinear_images.add(t.image)
        if isinstance(t, ImageTexture) and t.sampler.filter == FilterMode.NEAREST:
            any_nearest = True

    texels = []
    level_offset, level_w, level_h = [], [], []
    img_first_level = np.zeros(max(1, len(scene.images)), np.int32)
    img_n_levels = np.zeros(max(1, len(scene.images)), np.int32)
    offset = 0
    for i, img in enumerate(scene.images):
        if i in trilinear_images:
            levels = _build_mip_pyramid(img.data)
        else:
            levels = [img.data.astype(F)]
        img_first_level[i] = len(level_offset)
        img_n_levels[i] = len(levels)
        for lv in levels:
            h, w = lv.shape[:2]
            level_offset.append(offset)
            level_w.append(w)
            level_h.append(h)
            texels.append(lv.reshape(-1, 4))
            offset += h * w
    img_texels = (
        np.concatenate(texels, axis=0).astype(F)
        if texels
        else np.zeros((1, 4), F)
    )
    img_level_offset = np.asarray(level_offset or [0], np.int32)
    img_level_w = np.asarray(level_w or [1], np.int32)
    img_level_h = np.asarray(level_h or [1], np.int32)

    # quad atlas (see DeviceScene.img_quads): per-lane table gathers cost
    # per ROW on TPU, so folding the 2x2 footprint into one 16-wide row
    # quarters the texture-fetch gather count (cb_texture was bound on
    # these gathers). Cap the 4x memory blow-up at 256 MB.
    # Default ON only on TPU: the extra gather width restructures XLA:CPU's
    # fused shading loops enough that FMA contraction becomes chunk-shape-
    # dependent (9 cb_texture pixels flip a last ULP between chunk_pixels
    # 1<<13 and 1<<11), which would break the CPU backend's strict
    # bit-exact chunk-invariance contract. TPU renders are gated
    # statistically and already differ from CPU by contraction ULPs.
    quad_env = os.environ.get("TPU_RT_QUAD_ATLAS")
    if quad_env is None:
        try:
            quad_on = jax.default_backend() == "tpu"
        except Exception:
            quad_on = False
    else:
        quad_on = quad_env != "0"
    img_quads = None
    if (
        texels
        and img_texels.shape[0] * 64 <= 256 * 1024 * 1024
        and quad_on
    ):
        quads = []
        for off, w, h in zip(level_offset, level_w, level_h):
            lvl = img_texels[off:off + w * h].reshape(h, w, 4)
            xp = np.concatenate([lvl[:, 1:], lvl[:, -1:]], axis=1)
            q_top = np.concatenate([lvl, xp], axis=2)          # (h, w, 8)
            q_bot = np.concatenate([q_top[1:], q_top[-1:]], axis=0)
            quads.append(
                np.concatenate([q_top, q_bot], axis=2).reshape(-1, 16)
            )
        img_quads = np.concatenate(quads, axis=0).astype(F)

    # ---------------- textures
    n_tex = max(1, len(scene.textures))
    tex_kind = np.full(n_tex, TEX_CONSTANT, np.int32)
    tex_v0 = np.zeros((n_tex, 4), F)
    tex_v1 = np.zeros((n_tex, 4), F)
    tex_ref = np.full((n_tex, 3), -1, np.int32)
    tex_filter = np.zeros(n_tex, np.int32)
    tex_wrap = np.zeros(n_tex, np.int32)
    for i, t in enumerate(scene.textures):
        if isinstance(t, ImageTexture):
            tex_kind[i] = TEX_IMAGE
            tex_ref[i, 0] = t.image
            tex_filter[i] = int(t.sampler.filter)
            tex_wrap[i] = int(t.sampler.wrap)
        elif isinstance(t, ConstantTexture):
            tex_kind[i] = TEX_CONSTANT
            tex_v0[i] = t.value
        elif isinstance(t, CheckerTexture):
            tex_kind[i] = TEX_CHECKER
            tex_v0[i] = t.color1
            tex_v1[i] = t.color2
        elif isinstance(t, ScaleTexture):
            tex_kind[i] = TEX_SCALE
            tex_ref[i, 0] = t.a
            tex_ref[i, 1] = t.b
        elif isinstance(t, MixTexture):
            tex_kind[i] = TEX_MIX
            tex_ref[i, 0] = t.a
            tex_ref[i, 1] = t.b
            tex_ref[i, 2] = t.c
        else:
            raise TypeError(f"unknown texture: {t}")

    # packed single-gather rows for materials / textures / mip levels
    mat_pack = np.zeros((n_mats, 8), np.int32)
    mat_pack[:, 0] = mat_kind
    mat_pack[:, 1:6] = mat_tex
    mat_pack[:, 6] = mat_remap.astype(np.int32)

    tex_pack = np.zeros((n_tex, 16), F)
    tex_pack[:, 0:4] = tex_v0
    tex_pack[:, 4:8] = tex_v1
    ti = np.zeros((n_tex, 8), np.int32)
    # for image textures, bake the image indirection in: slot 0 becomes the
    # image's first mip level and slot 6 its level count
    is_img = tex_kind == TEX_IMAGE
    img_id = np.maximum(tex_ref[:, 0], 0)
    ti[:, 0] = np.where(is_img, img_first_level[img_id], tex_ref[:, 0])
    ti[:, 1] = tex_ref[:, 1]
    ti[:, 2] = tex_ref[:, 2]
    ti[:, 3] = tex_kind
    ti[:, 4] = tex_filter
    ti[:, 5] = tex_wrap
    ti[:, 6] = np.where(is_img, img_n_levels[img_id], 0)
    tex_pack[:, 8:16] = ti.view(F)

    # material-major join of the texture slots' rows (see DeviceScene doc).
    # Unset slots (-1) get a synthetic constant-zero row instead of row 0:
    # their values are never semantically consumed (materials.rs only reads
    # slots its kind defines; the roughness slot is guarded by tex>=0), and
    # a constant row keeps them out of the per-slot kind sets below.
    unset_row = np.zeros(16, F)
    ur_i = np.zeros(8, np.int32)
    ur_i[3] = TEX_CONSTANT
    unset_row[8:16] = ur_i.view(F)
    mat_tex_rows = np.zeros((n_mats, 5 * 16), F)
    for j in range(5):
        rows = tex_pack[np.maximum(mat_tex[:, j], 0)].copy()
        rows[mat_tex[:, j] < 0] = unset_row
        mat_tex_rows[:, 16 * j:16 * (j + 1)] = rows

    # static per-callsite texture-kind narrowing: the set of texture kinds
    # reachable from each material slot (through scale/mix children) and
    # from the environment texture. eval_texture's per-kind branches are
    # trace-time `if kind in kinds` — a slot whose textures are all
    # constants skips the whole image path, and with it the quad-atlas
    # gathers that dominate textured scenes (one 131k-row gather per
    # bilerp tap; docs/PERF_LOG.md round 4).
    def _reach_kinds(tid0: int) -> set:
        out, stack, seen = set(), [int(tid0)], set()
        while stack:
            t = stack.pop()
            if t < 0 or t >= n_tex or t in seen:
                continue
            seen.add(t)
            k = int(tex_kind[t])
            out.add(k)
            if k in (TEX_SCALE, TEX_MIX):
                stack.extend(int(r) for r in tex_ref[t] if r >= 0)
        return out or {TEX_CONSTANT}

    slot_kind_sets = []
    for j in range(5):
        ks = set()
        for i in range(n_mats):
            t = int(mat_tex[i, j])
            if t < 0:
                ks.add(TEX_CONSTANT)      # the synthetic unset row
                if j == 0:
                    # the AOV albedo path gathers tex_pack[max(tid, 0)]
                    # directly, so unset slot-0 ids read row 0 there
                    ks |= _reach_kinds(0)
            else:
                ks |= _reach_kinds(t)
        slot_kind_sets.append(tuple(sorted(ks)))
    if os.environ.get("TPU_RT_SLOT_KINDS", "1") == "0":
        # escape hatch: None entries fall back to the scene-wide kind set
        # at every call site (pre-narrowing executable shape)
        slot_kind_sets = [None] * 5

    lvl_pack = np.zeros((img_level_offset.shape[0], 4), np.int32)
    lvl_pack[:, 0] = img_level_offset
    lvl_pack[:, 1] = img_level_w
    lvl_pack[:, 2] = img_level_h

    # ---------------- lights
    n_lights = len(scene.lights)
    l_pad = max(1, n_lights)
    light_kind = np.zeros(l_pad, np.int32)
    light_va = np.zeros((l_pad, 3), F)
    light_vb = np.zeros((l_pad, 3), F)
    light_emit_first = np.zeros(l_pad, np.int32)
    light_emit_count = np.zeros(l_pad, np.int32)
    em_p0, em_p1, em_p2 = [], [], []
    em_n0, em_n1, em_n2 = [], [], []
    em_area, em_has_n = [], []
    light_kinds = []
    em_offset = 0
    for i, light in enumerate(scene.lights):
        if isinstance(light, PointLight):
            light_kind[i] = LIGHT_POINT
            light_va[i] = light.position
            light_vb[i] = light.intensity
        elif isinstance(light, DirectionLight):
            light_kind[i] = LIGHT_DIRECTION
            light_va[i] = light.direction
            light_vb[i] = light.radiance
        elif isinstance(light, DiffuseAreaLight):
            light_kind[i] = LIGHT_AREA
            light_vb[i] = light.radiance
            prim = scene.get_basic(light.prim_id)
            assert isinstance(prim.shape, TriangleMesh), (
                "area lights on analytic spheres are unsupported "
                "(reference: lights.rs:55 todo!())"
            )
            mesh = prim.shape.mesh
            m = np.asarray(light.light_to_world, F)
            verts_w = mesh.vertices @ m[:3, :3].T + m[:3, 3]
            tri = mesh.tris.astype(np.int64)
            p0, p1, p2 = verts_w[tri[:, 0]], verts_w[tri[:, 1]], verts_w[tri[:, 2]]
            em_p0.append(p0)
            em_p1.append(p1)
            em_p2.append(p2)
            if mesh.has_normals:
                nm = np.linalg.inv(np.asarray(m, np.float64))[:3, :3].T.astype(F)
                norms = mesh.normals @ nm.T
                em_n0.append(norms[tri[:, 0]])
                em_n1.append(norms[tri[:, 1]])
                em_n2.append(norms[tri[:, 2]])
                em_has_n.append(np.ones(len(tri), bool))
            else:
                z = np.zeros((len(tri), 3), F)
                em_n0.append(z)
                em_n1.append(z)
                em_n2.append(z)
                em_has_n.append(np.zeros(len(tri), bool))
            em_area.append(
                0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=-1)
            )
            light_emit_first[i] = em_offset
            light_emit_count[i] = len(tri)
            em_offset += len(tri)
        else:
            raise TypeError(f"unknown light: {light}")
        light_kinds.append(int(light_kind[i]))

    em_p0 = cat(em_p0, (3,))
    em_p1 = cat(em_p1, (3,))
    em_p2 = cat(em_p2, (3,))
    em_n0 = cat(em_n0, (3,))
    em_n1 = cat(em_n1, (3,))
    em_n2 = cat(em_n2, (3,))
    em_area = cat(em_area, ())
    em_has_n = cat(em_has_n, (), bool)
    if em_p0.shape[0] == 0:
        em_p0 = em_p1 = em_p2 = np.zeros((1, 3), F)
        em_n0 = em_n1 = em_n2 = np.zeros((1, 3), F)
        em_area = np.ones(1, F)
        em_has_n = np.zeros(1, bool)

    # single-gather shading rows: main world-space rows, then each BLAS's
    # object-space rows (indexed via the per-instance shade offset)
    tri_shade = _tri_shade_rows(acc)
    if blas_shade_rows:
        tri_shade = np.concatenate([tri_shade, *blas_shade_rows], axis=0)

    em_shade = np.zeros((em_p0.shape[0], 24), F)
    em_shade[:, 0:3] = em_p0
    em_shade[:, 3:6] = em_p1
    em_shade[:, 6:9] = em_p2
    em_shade[:, 9:12] = em_n0
    em_shade[:, 12:15] = em_n1
    em_shade[:, 15:18] = em_n2
    em_shade[:, 18] = em_area
    em_shade[:, 19] = em_has_n.astype(np.int32).view(F)

    # ---------------- camera
    cam = scene.camera
    ct = cam.camera_type
    if isinstance(ct, Orthographic):
        cam_kind, aperture, focal = CAM_ORTHOGRAPHIC, 0.0, 0.0
    elif isinstance(ct, PinholePerspective):
        cam_kind, aperture, focal = CAM_PINHOLE, 0.0, 0.0
    else:
        assert isinstance(ct, ThinLensPerspective)
        cam_kind = CAM_THIN_LENS
        aperture, focal = ct.aperture_radius, ct.focal_distance
    cam_min_diff = _minimum_differentials(cam)

    env_tex = -1
    has_env = scene.environment_light is not None
    if has_env:
        env_tex = int(scene.environment_light.radiance)

    meta = SceneMeta(
        n_tris=n_tris,
        n_spheres=n_spheres,
        n_lights=n_lights,
        n_materials=len(scene.materials),
        n_textures=len(scene.textures),
        light_kinds=tuple(light_kinds),
        mat_kinds_present=tuple(sorted(kinds_present)),
        tex_kinds_present=tuple(sorted({int(k) for k in tex_kind})),
        any_trilinear=bool(trilinear_images),
        any_nearest=any_nearest,
        has_env=has_env,
        env_tex=env_tex,
        slot_kinds=tuple(slot_kind_sets),
        env_kinds=() if slot_kind_sets[0] is None      # knob escape hatch
        else tuple(sorted(_reach_kinds(env_tex)))
        if has_env else (int(TEX_CONSTANT),),
        cam_kind=cam_kind,
        width=cam.raster_width,
        height=cam.raster_height,
        near_clip=float(cam.near_clip),
        far_clip=float(cam.far_clip),
        aperture_radius=float(aperture),
        focal_distance=float(focal),
        root_meta=int(root_meta),
        bvh2_depth=int(bvh2_depth),
        n_bvh_nodes=int(n_nodes),
        root_meta4=int(root_meta4),
        bvh4_stack=int(bvh4_stack),
        root_meta4r=int(acc.root_meta4r),
        t8_stack=int(acc.t8_stack),
        t8_width=_t8_width(),
        t8_root_ints=int(acc.t8_meta[0, 0])
        & ((1 << _t8_fld(_t8_width())) - 1),
        t8_leaf=_t8_lg(),
        t8_chunk_meta=tuple(
            (int(stk), tuple(float(v) for v in mn), tuple(float(v) for v in mx))
            for (_n, _m, _t, stk, mn, mx) in acc.t8_chunks
        ),
        blas_meta=tuple(blas_meta),
        instances=tuple(instances),
        inst_vtri_base0=int(inst_vtri_base0),
    )

    n_inst = len(instances)
    inst_xf = np.zeros((max(1, n_inst), 32), F)
    inst_aabb_min = np.zeros((max(1, n_inst), 3), F)
    inst_aabb_max = np.zeros((max(1, n_inst), 3), F)
    for i, (o2w, w2o) in enumerate(inst_mats):
        inst_xf[i, :16] = o2w.reshape(-1)
        inst_xf[i, 16:] = w2o.reshape(-1)
        inst_aabb_min[i], inst_aabb_max[i] = inst_aabbs[i]
    blas_tables = tuple(
        BlasTables(
            bvh2_rows=jnp.asarray(b.bvh2_rows),
            tri_pack=jnp.asarray(b.tri_pack),
            bvh4_recs_pk=jnp.asarray(b.bvh4_recs_pk),
            bvh2_rows_pk=jnp.asarray(b.bvh2_rows_pk),
            bvh_nodes_pk=jnp.asarray(b.bvh_nodes_pk),
            tri_pack_pk=jnp.asarray(b.tri_pack_pk),
            bvh4_rows=jnp.asarray(b.bvh4_rows),
            tri_rows=jnp.asarray(b.tri_rows),
            t8_nodes=jnp.asarray(b.t8_nodes),
            t8_meta=jnp.asarray(b.t8_meta),
            t8_tris=jnp.asarray(b.t8_tris),
        )
        for b in blas_accels
    )

    dev = lambda a: jnp.asarray(a)  # noqa: E731
    return DeviceScene(
        tri_p0=dev(tri_p0), tri_p1=dev(tri_p1), tri_p2=dev(tri_p2),
        tri_n0=dev(tri_n0), tri_n1=dev(tri_n1), tri_n2=dev(tri_n2),
        tri_uv0=dev(tri_uv0), tri_uv1=dev(tri_uv1), tri_uv2=dev(tri_uv2),
        tri_mat=dev(tri_mat), tri_light=dev(tri_light),
        tri_has_n=dev(tri_has_n), tri_has_uv=dev(tri_has_uv),
        bvh_min=dev(bvh_min), bvh_max=dev(bvh_max),
        bvh_first=dev(bvh_first), bvh_count=dev(bvh_count),
        bvh_skip=dev(bvh_skip),
        bvh_nodes=dev(bvh_nodes), tri_pack=dev(tri_pack),
        bvh_nodes_pk=dev(bvh_nodes_pk), tri_pack_pk=dev(tri_pack_pk),
        bvh2_rows_pk=dev(bvh2_rows_pk), bvh4_recs_pk=dev(bvh4_recs_pk),
        bvh4_rows=dev(acc.bvh4_rows), tri_rows=dev(acc.tri_rows),
        t8_nodes=dev(acc.t8_nodes), t8_meta=dev(acc.t8_meta),
        t8_tris=dev(acc.t8_tris),
        t8_chunks=tuple(
            (dev(n), dev(m), dev(t))
            for (n, m, t, _stk, _mn, _mx) in acc.t8_chunks
        ),
        bvh2_rows=dev(bvh2_rows),
        sph_center=dev(sph_center), sph_radius=dev(sph_radius),
        sph_o2w=dev(sph_o2w), sph_w2o=dev(sph_w2o),
        sph_mat=dev(sph_mat), sph_light=dev(sph_light),
        mat_kind=dev(mat_kind), mat_tex=dev(mat_tex), mat_remap=dev(mat_remap),
        mat_pack=dev(mat_pack), tex_pack=dev(tex_pack), lvl_pack=dev(lvl_pack),
        mat_tex_rows=dev(mat_tex_rows),
        tex_kind=dev(tex_kind), tex_v0=dev(tex_v0), tex_v1=dev(tex_v1),
        tex_ref=dev(tex_ref), tex_filter=dev(tex_filter), tex_wrap=dev(tex_wrap),
        img_texels=dev(img_texels),
        img_quads=dev(img_quads) if img_quads is not None else None,
        img_level_offset=dev(img_level_offset),
        img_level_w=dev(img_level_w), img_level_h=dev(img_level_h),
        img_first_level=dev(img_first_level), img_n_levels=dev(img_n_levels),
        light_kind=dev(light_kind), light_va=dev(light_va), light_vb=dev(light_vb),
        light_emit_first=dev(light_emit_first),
        light_emit_count=dev(light_emit_count),
        em_p0=dev(em_p0), em_p1=dev(em_p1), em_p2=dev(em_p2),
        em_n0=dev(em_n0), em_n1=dev(em_n1), em_n2=dev(em_n2),
        em_area=dev(em_area), em_has_n=dev(em_has_n),
        tri_shade=dev(tri_shade), em_shade=dev(em_shade),
        cam_raster_to_camera=dev(cam.raster_to_camera.forward),
        cam_camera_to_world=dev(cam.camera_to_world.forward),
        cam_min_diff=dev(cam_min_diff),
        bounds_center=dev(bounds_center),
        bounds_radius=dev(bounds_radius),
        blas_tables=blas_tables,
        inst_xf=dev(inst_xf),
        inst_aabb_min=dev(inst_aabb_min),
        inst_aabb_max=dev(inst_aabb_max),
        meta=meta,
    )


def _minimum_differentials(cam) -> np.ndarray:
    """Minimum per-pixel ray differentials (lib.rs:111-143 semantics).

    Rows: x_origin, y_origin, x_direction, y_direction.
    """
    w2r_inv = cam.world_to_raster.inverse

    def inv_point(p):
        from ..geometry.matrix import apply_point

        return apply_point(w2r_inv, p)

    out = np.zeros((4, 3), F)
    if isinstance(cam.camera_type, Orthographic):
        origin = inv_point([0.0, 0.0, 0.0])
        dx = inv_point([1.0, 0.0, 0.0])
        dy = inv_point([0.0, 1.0, 0.0])
        out[0] = dx - origin
        out[1] = dy - origin
    else:
        cx, cy = cam.raster_width / 2.0, cam.raster_height / 2.0
        center = inv_point([cx, cy, 0.0])
        dx = inv_point([cx + 1.0, cy, 0.0])
        dy = inv_point([cx, cy + 1.0, 0.0])
        out[2] = dx - center
        out[3] = dy - center
    return out
