"""Data pipeline tests on fabricated on-disk datasets (no real DSEC /
NCaltech data in this environment; layout matches the reference's,
reference: src/dagr/data/dsec_data.py, ncaltech101_data.py)."""
import numpy as np
import pytest

from dagr_tpu.data.augment import Augmentations, Compose, Crop, RandomHFlip, RandomZoom
from dagr_tpu.data.downsample import downsample_file, write_event_h5
from dagr_tpu.data.dsec import DSEC, DSEC_CLASSES, TRACK_DTYPE
from dagr_tpu.data.loader import Loader
from dagr_tpu.data.ncaltech101 import NCaltech101
from dagr_tpu.data.sample import EventSample, bbox_to_targets, collate


def make_dsec_sequence(root, name, n_images=4, dt_us=50_000, seed=0):
    """Fabricate one DSEC sequence directory."""
    import cv2
    import yaml

    rng = np.random.default_rng(seed)
    seq = root / "train" / name
    (seq / "images" / "left" / "rectified").mkdir(parents=True)
    (seq / "object_detections" / "left").mkdir(parents=True)
    (seq / "events" / "left").mkdir(parents=True)

    t0 = 1_000_000
    ts = t0 + np.arange(n_images) * dt_us
    np.savetxt(seq / "images" / "timestamps.txt", ts, fmt="%d")

    tracks = []
    for i, t in enumerate(ts):
        # one car (class 2 in DSEC order), big enough to survive filters
        tracks.append((t, 100.0 + 4 * i, 120.0, 120.0, 90.0, 2, 7, 1.0))
        # one filtered-out class (rider = 1)
        tracks.append((t, 300.0, 200.0, 80.0, 80.0, 1, 8, 1.0))
    np.save(seq / "object_detections" / "left" / "tracks.npy",
            np.array(tracks, dtype=TRACK_DTYPE))

    for i in range(n_images):
        img = rng.integers(0, 255, (480, 640, 3), np.uint8)
        cv2.imwrite(str(seq / "images" / "left" / "rectified" / f"{i:06d}.png"), img)

    n_ev = 5000
    t_ev = np.sort(rng.integers(ts[0], ts[-1], n_ev)).astype(np.int64)
    events = dict(
        x=rng.integers(0, 320, n_ev).astype(np.uint16),
        y=rng.integers(0, 240, n_ev).astype(np.uint16),
        t=t_ev,
        p=rng.integers(0, 2, n_ev).astype(np.uint8),
    )
    write_event_h5(seq / "events" / "left" / "events_2x.h5", events)

    # split yaml listing just this sequence
    split_yaml = root / "split.yaml"
    with open(split_yaml, "w") as f:
        yaml.safe_dump({"train": [name], "val": [], "test": []}, f)
    return split_yaml


@pytest.fixture
def dsec_root(tmp_path):
    split = make_dsec_sequence(tmp_path, "zurich_city_99_x")
    return tmp_path, split


def test_dsec_getitem(dsec_root):
    root, split = dsec_root
    ds = DSEC(root, "train", min_bbox_diag=15, min_bbox_height=10,
              split_yaml=split)
    assert ds.width == 320 and ds.height == 215
    assert len(ds) == 3  # 4 images -> 3 consecutive pairs
    s = ds[0]
    assert s.num_events > 0
    # events windowed + shifted: last event at time_window
    assert s.t[-1] == ds.time_window
    assert (s.y < ds.height).all()
    assert set(np.unique(s.p)) <= {-1, 1}
    # car box rescaled by 2, rider filtered by class
    assert len(s.bbox) == 1
    np.testing.assert_allclose(s.bbox[0, :4], [52, 60, 60, 45], atol=1e-5)
    assert s.bbox[0, 4] == 0  # car -> class 0
    assert s.image.shape == (215, 320, 3)


def test_dsec_interframe_interpolation(dsec_root):
    root, split = dsec_root
    ds = DSEC(root, "train", split_yaml=split)
    ds.set_num_us(25_000)  # halfway between frames
    s = ds[0]
    # gt interpolated halfway between x=50 (100/2) and x=52 (104/2)
    np.testing.assert_allclose(s.bbox[0, 0], 51.0, atol=1e-5)
    assert s.t1 == s.t0 + 25_000


def test_collate_shapes(dsec_root):
    root, split = dsec_root
    ds = DSEC(root, "train", split_yaml=split)
    loader = Loader(ds, batch_size=2, n_nodes=1024, with_images=True)
    batch, targets, images = next(iter(loader))
    assert batch.pos.shape == (2, 1024, 3)
    assert targets.shape == (2, 100, 5)
    assert images.shape == (2, 215, 320, 3)
    assert float(images.max()) <= 1.0
    # targets are (class, cx, cy, w, h)
    t = np.asarray(targets[0, 0])
    assert t[3] > 0 and t[4] > 0


def make_ncaltech(root, n_classes=3, n_files=2, seed=0):
    import h5py

    rng = np.random.default_rng(seed)
    for c in range(n_classes):
        cdir = root / "training" / f"class_{c:02d}"
        adir = root / "training" / ".." / "annotations" / f"class_{c:02d}"
        cdir.mkdir(parents=True, exist_ok=True)
        adir.mkdir(parents=True, exist_ok=True)
        for i in range(n_files):
            n = 3000
            with h5py.File(cdir / f"image_{i:04d}.h5", "w") as f:
                f.create_dataset("events/x", data=rng.integers(0, 240, n).astype(np.uint16))
                f.create_dataset("events/y", data=rng.integers(0, 180, n).astype(np.uint16))
                f.create_dataset("events/t", data=np.sort(rng.integers(0, 300_000, n)).astype(np.int64))
                f.create_dataset("events/p", data=(2 * rng.integers(0, 2, n) - 1).astype(np.int8))
            ann = np.zeros(10, np.int16)
            ann[2:10] = [10, 20, 150, 20, 150, 120, 10, 120]  # x1 y1 x2 y1 x2 y2 x1 y2
            with open(adir / f"annotation_{i:04d}.bin", "wb") as f:
                ann.tofile(f)


def test_ncaltech(tmp_path):
    make_ncaltech(tmp_path)
    ds = NCaltech101(tmp_path, "training", num_events=2000)
    assert ds.num_classes == 3
    assert len(ds) == 6
    s = ds[0]
    assert s.num_events == 2000
    # reference shifts so the last event sits at T-1 (ncaltech101_data.py:36-38)
    assert s.t[-1] == ds.time_window - 1
    np.testing.assert_allclose(s.bbox[0], [10, 20, 140, 100, 0])


def test_hflip_and_crop():
    s = EventSample(
        x=np.array([10, 50], np.int16), y=np.array([5, 25], np.int16),
        t=np.array([1, 2], np.int32), p=np.array([1, -1], np.int8),
        width=100, height=50,
        bbox=np.array([[10., 5., 20., 10., 0.]], np.float32),
    )
    rng = np.random.default_rng(0)
    flip = RandomHFlip(p=1.1)
    s2 = flip(s.copy(), rng)
    np.testing.assert_array_equal(s2.x, [89, 49])
    # bbox x -> W-1-(x+w) = 99-30 = 69
    assert s2.bbox[0, 0] == 69

    crop = Crop([0, 0], [0.4, 1.0])
    crop.init(50, 100)
    s3 = crop(s.copy(), rng)
    assert len(s3.x) == 1  # x=50 > 0.4*100 cropped
    # bbox clipped to x range [0, 39]
    assert s3.bbox[0, 0] + s3.bbox[0, 2] <= 39 + 1e-5


def test_zoom_scales_bbox():
    s = EventSample(
        x=np.array([60], np.int16), y=np.array([30], np.int16),
        t=np.array([1], np.int32), p=np.array([1], np.int8),
        width=100, height=50,
        bbox=np.array([[40., 20., 20., 10., 0.]], np.float32),
    )
    z = RandomZoom(zoom=(2.0, 2.0))
    z.init(50, 100)
    s2 = z(s.copy(), np.random.default_rng(0))
    # around center (50, 25): x 60 -> 70, bbox w doubles
    assert s2.x[0] == 70
    np.testing.assert_allclose(s2.bbox[0, 2:4], [40, 20])


def test_training_preset_keeps_sample_valid(dsec_root):
    root, split = dsec_root
    aug = Augmentations.training()
    ds = DSEC(root, "train", transform=aug, min_bbox_diag=15,
              min_bbox_height=10, split_yaml=split)
    s = ds[1]
    # final Crop([0,0],[1,1]) guarantees in-bounds events
    if s.num_events:
        assert s.x.min() >= 0 and s.x.max() < ds.width
        assert s.y.min() >= 0 and s.y.max() < ds.height


def test_downsample_tool(tmp_path):
    import h5py

    rng = np.random.default_rng(0)
    n = 20_000
    # concentrated, same-polarity events so the 2x2 accumulator actually
    # fires (a cell emits one event per 4 unit-polarity inputs)
    events = dict(
        x=rng.integers(0, 64, n).astype(np.uint16),
        y=rng.integers(0, 48, n).astype(np.uint16),
        t=np.sort(rng.integers(0, 1_000_000, n)).astype(np.int64),
        p=np.ones(n, np.uint8),
    )
    src = tmp_path / "events.h5"
    write_event_h5(src, events)
    dst = tmp_path / "events_2x.h5"
    downsample_file(src, dst)
    with h5py.File(dst) as f:
        x = f["events/x"][()]
        y = f["events/y"][()]
        m = f["ms_to_idx"][()]
        assert len(x) > 0
        # one output event per 4 unit-polarity inputs in a 2x2 cell
        assert 0.2 < len(x) / n < 0.3
        assert x.max() < 32 and y.max() < 24
        assert (np.diff(m.astype(np.int64)) >= 0).all()


def write_event_h5_blosc(path, events, t_offset=None, chunk=1024):
    """Reference-format event file: blosc-zstd, bit shuffle, level 1
    (reference: scripts/downsample_events.py:15-34)."""
    import h5py

    from dagr_tpu.data import h5io
    from dagr_tpu.data.downsample import create_ms_to_idx

    t = np.asarray(events["t"], np.int64)
    if t_offset is None:
        t_offset = int(t[0]) if len(t) else 0
    t = t - t_offset
    kw = dict(cname="zstd", shuffle=2, clevel=1, chunk=chunk)
    with h5py.File(path, "w") as f:
        h5io.write_blosc_dataset(f, "events/x", np.asarray(events["x"], np.uint16), **kw)
        h5io.write_blosc_dataset(f, "events/y", np.asarray(events["y"], np.uint16), **kw)
        h5io.write_blosc_dataset(f, "events/p", np.asarray(events["p"], np.uint8), **kw)
        h5io.write_blosc_dataset(f, "events/t", t.astype(np.uint32), **kw)
        h5io.write_blosc_dataset(f, "ms_to_idx", create_ms_to_idx(t), **kw)
        f.create_dataset("t_offset", data=np.int64(t_offset))


def test_dsec_reads_blosc_event_files(tmp_path):
    """The real DSEC files are blosc-compressed (filter 32001); the
    reader must produce identical events from gzip and blosc variants."""
    from dagr_tpu.data.dsec import DSECSequence

    rng = np.random.default_rng(3)
    n = 5000
    t0 = 1_000_000
    events = dict(
        x=rng.integers(0, 320, n).astype(np.uint16),
        y=rng.integers(0, 240, n).astype(np.uint16),
        t=np.sort(rng.integers(t0, t0 + 150_000, n)).astype(np.int64),
        p=rng.integers(0, 2, n).astype(np.uint8),
    )
    for name, writer in [("gzip", write_event_h5),
                         ("blosc", write_event_h5_blosc)]:
        seq = tmp_path / name / "seq"
        (seq / "events" / "left").mkdir(parents=True)
        (seq / "images" / "left" / "rectified").mkdir(parents=True)
        (seq / "object_detections" / "left").mkdir(parents=True)
        np.savetxt(seq / "images" / "timestamps.txt", [t0], fmt="%d")
        np.save(seq / "object_detections" / "left" / "tracks.npy",
                np.zeros(0, dtype=TRACK_DTYPE))
        writer(seq / "events" / "left" / "events_2x.h5", events)

    ev_g = DSECSequence(tmp_path / "gzip" / "seq").get_events(t0 + 10_000, t0 + 90_000)
    ev_b = DSECSequence(tmp_path / "blosc" / "seq").get_events(t0 + 10_000, t0 + 90_000)
    assert len(ev_g["t"]) > 0
    for k in "xytp":
        np.testing.assert_array_equal(ev_g[k], ev_b[k])


def test_ncaltech_reads_blosc(tmp_path):
    import h5py

    from dagr_tpu.data import h5io

    rng = np.random.default_rng(1)
    cdir = tmp_path / "training" / "class_00"
    adir = tmp_path / "training" / ".." / "annotations" / "class_00"
    cdir.mkdir(parents=True)
    adir.mkdir(parents=True)
    n = 3000
    with h5py.File(cdir / "image_0000.h5", "w") as f:
        kw = dict(cname="zstd", shuffle=2, chunk=512)
        h5io.write_blosc_dataset(f, "events/x", rng.integers(0, 240, n).astype(np.uint16), **kw)
        h5io.write_blosc_dataset(f, "events/y", rng.integers(0, 180, n).astype(np.uint16), **kw)
        h5io.write_blosc_dataset(f, "events/t", np.sort(rng.integers(0, 300_000, n)).astype(np.int64), **kw)
        h5io.write_blosc_dataset(f, "events/p", (2 * rng.integers(0, 2, n) - 1).astype(np.int8), **kw)
    ann = np.zeros(10, np.int16)
    ann[2:10] = [10, 20, 150, 20, 150, 120, 10, 120]
    with open(adir / "annotation_0000.bin", "wb") as f:
        ann.tofile(f)

    ds = NCaltech101(tmp_path, "training", num_events=2000)
    s = ds[0]
    assert s.num_events == 2000
    assert s.t[-1] == ds.time_window - 1
