"""IV2 linear / attentive probing: freeze semantics + CLI smoke.

Reference: other_models/InternVideo2_single_modality/run_linear_probing.py
:548-573 (freeze backbone except the last open_block_num blocks; the
clip_projector opens only with --open_clip_projector)."""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import simple_tad_tpu as st
from simple_tad_tpu.train.optim import freeze_mask_tree


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("k400p")
    rows = []
    for i in range(4):
        label = i % 2
        path = root / f"vid{i}.avi"
        wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                             10, (64, 48))
        for t in range(40):
            wr.write(np.full((48, 64, 3), 60 + label * 120 + t % 7,
                             np.uint8))
        wr.release()
        rows.append(f"{path},{label}")
    anno = root / "anno.csv"
    anno.write_text("\n".join(rows) + "\n")
    return str(root), str(anno)


def _tiny_iv2():
    return st.create_model("internvideo2_small_patch14_224", num_classes=2,
                           all_frames=8, img_size=28, dtype=jnp.float32)


def test_probe_freeze_mask_semantics():
    model = _tiny_iv2()
    params = model.init_params(jax.random.PRNGKey(0))
    depth = model.cfg.depth
    tree = freeze_mask_tree(params, "probe;1;0", depth)
    blocks_mask = tree["blocks"]["fc1"]["kernel"]
    vec = np.asarray(blocks_mask).reshape(depth)
    assert vec[-1] == 1.0 and vec[:-1].sum() == 0.0
    assert float(np.asarray(
        tree["clip_projector"]["proj"]["kernel"])) == 0.0
    assert float(np.asarray(tree["head"]["kernel"])) == 1.0
    assert float(np.asarray(tree["pos_embed"])) == 0.0
    # attentive probe: projector opens
    tree2 = freeze_mask_tree(params, "probe;0;1", depth)
    assert float(np.asarray(
        tree2["clip_projector"]["proj"]["kernel"])) == 1.0
    assert np.asarray(tree2["blocks"]["fc1"]["kernel"]).sum() == 0.0


def test_linear_probe_cli_trunk_frozen(video_root, tmp_path):
    """One CLI epoch with open_block_num=1: every trunk param except the
    last block is BIT-identical afterwards; head and last block move."""
    from simple_tad_tpu.cli.linear_probe import main
    root, anno = video_root
    out = str(tmp_path / "probe")
    argv = [
        "--anno_train", anno, "--data_path", root,
        "--model", "internvideo2_small_patch14_224", "--nb_classes", "2",
        "--num_frames", "8", "--sampling_rate", "2", "--input_size", "28",
        "--short_side_size", "40", "--batch_size", "1", "--epochs", "1",
        "--warmup_epochs", "0", "--output_dir", out,
        "--dtype", "float32", "--open_block_num", "1",
    ]
    state = main(argv)
    assert int(state.step) == 1

    model = _tiny_iv2()
    params0 = model.init_params(jax.random.PRNGKey(0))
    after = jax.tree.map(np.asarray, state.params)

    def leaves(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from leaves(v, path + (k,))
        else:
            yield path, np.asarray(tree)

    before = dict(leaves(params0))
    moved_head = False
    for path, b in dict(leaves(after)).items():
        a = before[path]
        if path[0] == "blocks":
            # frozen depths bit-identical; only the last block may move
            np.testing.assert_array_equal(a[:-1], b[:-1], err_msg=str(path))
        elif path[0] in ("clip_projector", "pos_embed", "pos_embed_spatial",
                         "pos_embed_temporal", "pos_embed_cls", "cls_token",
                         "patch_kernel", "patch_bias"):
            np.testing.assert_array_equal(a, b, err_msg=str(path))
        elif path[0] == "head":
            moved_head = moved_head or not np.array_equal(a, b)
    assert moved_head, "classifier head must train"
