"""Explorer tests (parity surface: reference tests/test_explorer.py, LanceDB-free)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def toy_imgs(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("expl")
    (root / "images").mkdir()
    rng = np.random.default_rng(0)
    # 3 red-ish, 3 blue-ish images: similarity should cluster by color
    for i in range(6):
        img = np.zeros((64, 64, 3), np.uint8)
        color = (255, 0, 0) if i < 3 else (0, 0, 255)
        img[:, :] = color
        img += rng.integers(0, 30, img.shape, dtype=np.uint8)
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
    return root / "images"


def test_explorer_similarity(toy_imgs, tmp_path):
    from yolo_ad_refine_tpu.data.explorer import Explorer
    from yolo_ad_refine_tpu.models.model import build_detection_model

    tiny = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv", [8, 3, 2]],
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
        ],
        "head": [[[2, 3, 4], 1, "Detect", ["nc"]]],
    }
    model = build_detection_model(tiny, imgsz=64)
    ex = Explorer(img_path=toy_imgs, model=model, imgsz=64, batch=4)
    emb = ex.create_embeddings_table(cache=tmp_path / "emb.npz")
    assert emb.shape[0] == 6
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-3)

    sim = ex.get_similar(idx=0, limit=6)
    # self similarity is maximal (ties possible with near-identical images)
    self_entry = next(s for s in sim if s["idx"] == 0)
    assert self_entry["similarity"] == pytest.approx(1.0, abs=1e-4)
    assert sim[0]["similarity"] == pytest.approx(1.0, abs=1e-4)
    # results are sorted by similarity
    sims = [s["similarity"] for s in sim]
    assert sims == sorted(sims, reverse=True)

    # cache roundtrip
    ex2 = Explorer(img_path=toy_imgs, model=model, imgsz=64, batch=4)
    emb2 = ex2.create_embeddings_table(cache=tmp_path / "emb.npz")
    np.testing.assert_allclose(emb, emb2)


@pytest.fixture(scope="module")
def labeled_ds(tmp_path_factory):
    """4 images with known class layouts for SQL queries."""
    import cv2

    root = tmp_path_factory.mktemp("expl_sql")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(1)
    # per-image class lists: 0=person, 1=dog, 2=car
    layouts = [[0, 0, 1], [0], [1, 2], [2, 2]]
    for i, classes in enumerate(layouts):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        # distinct boxes per row: exact-duplicate rows are dropped by the
        # dataset (reference data/utils.py verify_image_label dedup)
        lines = [f"{c} 0.{3 + 2 * j} 0.5 0.2 0.2" for j, c in enumerate(classes)]
        (root / "labels" / f"{i}.txt").write_text("\n".join(lines))
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images\nval: images\nnc: 3\n"
        "names:\n  0: person\n  1: dog\n  2: car\n")
    return root / "data.yaml"


def test_explorer_sql_query(labeled_ds):
    from yolo_ad_refine_tpu.data.explorer import Explorer

    ex = Explorer(data=str(labeled_ds), imgsz=64)
    rows = ex.sql_query("SELECT * FROM 'table' WHERE labels LIKE '%person%'")
    assert {r["id"] for r in rows} == {0, 1}
    rows = ex.sql_query("WHERE n_labels = 2")
    assert {r["id"] for r in rows} == {2, 3}
    with pytest.raises(ValueError):
        ex.sql_query("DROP TABLE 'table'")


def test_explorer_ask_ai_and_plot(labeled_ds):
    from yolo_ad_refine_tpu.data.explorer import Explorer

    ex = Explorer(data=str(labeled_ds), imgsz=64)
    rows = ex.ask_ai("show images with 2 persons and 1 dog")
    assert [r["id"] for r in rows] == [0]
    rows = ex.ask_ai("images with a car")
    assert {r["id"] for r in rows} == {2, 3}
    with pytest.raises(ValueError):
        ex.ask_ai("what is the meaning of life")
    grid = ex.plot_sql_query("WHERE labels LIKE '%dog%'")
    assert grid is not None and grid.ndim == 3 and grid.dtype == np.uint8
