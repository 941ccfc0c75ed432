"""Mesh, skinning, and skeletal animation (SURVEY.md §2 row 16): analytic
two-bone arm skinning, clip sampling, and a minimal embedded-glTF import."""

import base64
import json
import struct

import numpy as np

from starframe_tpu.mesh import (
    AnimationClip,
    Animator,
    Mesh,
    Skeleton,
    Skin,
    bind_inverse,
    fk_world_poses,
    load_gltf,
    sample_clip,
    skin_verts,
)


def _two_bone_arm():
    """Root at origin pointing +x; elbow bone 1 unit along +x."""
    skel = Skeleton(
        parent=np.array([-1, 0], np.int32),
        bind_pos=np.array([[0.0, 0.0], [1.0, 0.0]], np.float32),
        bind_angle=np.zeros(2, np.float32),
    )
    # strip mesh along the arm: verts at x = 0, 0.5, 1.0, 1.5, 2.0
    verts = np.array([[x, 0.0] for x in (0.0, 0.5, 1.0, 1.5, 2.0)], np.float32)
    tris = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    mesh = Mesh(verts=verts, tris=tris)
    # rigid weights: verts before elbow -> bone 0, after -> bone 1
    joints = np.array([[0, 0], [0, 0], [1, 0], [1, 0], [1, 0]], np.int32)
    weights = np.array([[1, 0]] * 5, np.float32)
    ibp, iba = bind_inverse(skel)
    skin = Skin(joints=joints, weights=weights, inv_bind_pos=ibp,
                inv_bind_angle=iba)
    return skel, mesh, skin


def test_fk_chain():
    skel, _, _ = _two_bone_arm()
    wp, wa = fk_world_poses(
        skel, np.array([[0, 0], [1, 0]], np.float32),
        np.array([np.pi / 2, 0.0], np.float32))
    np.testing.assert_allclose(np.asarray(wp)[1], [0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(wa), [np.pi / 2, np.pi / 2], atol=1e-6)


def test_two_bone_skinning_bends_at_elbow():
    skel, mesh, skin = _two_bone_arm()
    # bend the elbow 90 degrees
    lp = np.asarray(skel.bind_pos)
    la = np.array([0.0, np.pi / 2], np.float32)
    wp, wa = fk_world_poses(skel, lp, la)
    out = np.asarray(skin_verts(mesh.verts, skin.joints, skin.weights,
                                wp, wa, skin.inv_bind_pos, skin.inv_bind_angle))
    # bone-0 verts unchanged
    np.testing.assert_allclose(out[0], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.5, 0.0], atol=1e-6)
    # bone-1 verts rotate about the elbow at (1, 0)
    np.testing.assert_allclose(out[2], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[3], [1.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[4], [1.0, 1.0], atol=1e-6)


def test_clip_sampling_interpolates():
    skel, mesh, skin = _two_bone_arm()
    clip = AnimationClip(
        times=np.array([0.0, 1.0], np.float32),
        pos=np.tile(skel.bind_pos[None], (2, 1, 1)),
        angle=np.array([[0.0, 0.0], [0.0, np.pi / 2]], np.float32),
    )
    p, a = sample_clip(clip, 0.5)
    np.testing.assert_allclose(np.asarray(a), [0.0, np.pi / 4], atol=1e-6)
    anim = Animator(skel, skin, mesh, clip)
    tip0 = np.asarray(anim.skinned(0.0))[-1]
    tip1 = np.asarray(anim.skinned(1.0))[-1]
    np.testing.assert_allclose(tip0, [2.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(tip1, [1.0, 1.0], atol=1e-5)


def _tiny_gltf() -> bytes:
    """Embedded-buffer glTF: a 3-vertex skinned triangle on a 2-bone chain
    with a rotation animation on the child bone."""
    def floats(a):
        a = np.asarray(a, np.float32).ravel()
        return a.tobytes()

    pos = floats([[0, 0, 0], [1, 0, 0], [2, 0, 0]])
    joints = np.asarray([[0, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]],
                        np.uint16).tobytes()
    weights = floats([[1, 0, 0, 0]] * 3)
    idx = np.asarray([0, 1, 2], np.uint16).tobytes()
    anim_t = floats([0.0, 1.0])
    s, c = np.sin(np.pi / 4 / 2), np.cos(np.pi / 4 / 2)  # 45deg about z
    anim_q = floats([[0, 0, 0, 1], [0, 0, s, c]])
    buf = pos + joints + weights + idx + anim_t + anim_q

    views = []
    offs = 0
    for blen in (len(pos), len(joints), len(weights), len(idx),
                 len(anim_t), len(anim_q)):
        views.append({"buffer": 0, "byteOffset": offs, "byteLength": blen})
        offs += blen
    g = {
        "asset": {"version": "2.0"},
        "buffers": [{
            "byteLength": len(buf),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(buf).decode(),
        }],
        "bufferViews": views,
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "VEC4"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC4"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 5, "componentType": 5126, "count": 2, "type": "VEC4"},
        ],
        "nodes": [
            {"name": "root", "children": [1], "translation": [0, 0, 0]},
            {"name": "elbow", "translation": [1, 0, 0]},
        ],
        "skins": [{"joints": [0, 1]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "JOINTS_0": 1, "WEIGHTS_0": 2},
            "indices": 3,
        }]}],
        "animations": [{
            "name": "bend",
            "samplers": [{"input": 4, "output": 5, "interpolation": "LINEAR"}],
            "channels": [{"sampler": 0,
                          "target": {"node": 1, "path": "rotation"}}],
        }],
    }
    return json.dumps(g).encode()


def test_gltf_import_and_animate():
    asset = load_gltf(_tiny_gltf())
    mesh = asset["meshes"][0]
    skel = asset["skeleton"]
    skin = asset["skin"]
    clip = asset["clips"]["bend"]
    assert mesh.verts.shape == (3, 2)
    assert skel.n_bones == 2 and skel.parent.tolist() == [-1, 0]
    anim = Animator(skel, skin, mesh, clip)
    tip0 = np.asarray(anim.skinned(0.0))[-1]
    np.testing.assert_allclose(tip0, [2.0, 0.0], atol=1e-5)
    tip1 = np.asarray(anim.skinned(1.0))[-1]
    # elbow rotated 45deg: tip at (1,0) + R(45)*(1,0)
    np.testing.assert_allclose(
        tip1, [1 + np.cos(np.pi / 4), np.sin(np.pi / 4)], atol=1e-4)
