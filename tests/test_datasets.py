"""Dataset reader tests with synthetic on-disk fixtures (no real data needed)."""
import numpy as np
import pytest

from pylidar_slam_tpu.dataset import DATASET


def test_all_datasets_registered():
    expected = {"kitti", "kitti_360", "nclt", "nhcd", "ford_campus", "rosbag",
                "urban_loco", "synthetic"}
    assert expected.issubset(set(DATASET.keys()))


def test_pcd_round_trip(tmp_path):
    from pylidar_slam_tpu.dataset.pcd_io import read_pcd, write_pcd
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    for binary in (True, False):
        path = tmp_path / f"cloud_{binary}.pcd"
        write_pcd(str(path), pts, binary=binary)
        back = read_pcd(str(path))
        np.testing.assert_allclose(back, pts, atol=1e-5)


def test_rosbag_round_trip(tmp_path):
    from pylidar_slam_tpu.dataset.rosbag_reader import (
        BagReader, decode_pointcloud2, encode_pointcloud2, write_simple_bag)
    rng = np.random.default_rng(1)
    clouds = [rng.normal(size=(200, 3)).astype(np.float32) for _ in range(3)]
    messages = [(int(1e9 * (i + 1)), encode_pointcloud2(c, stamp_s=i + 1.0))
                for i, c in enumerate(clouds)]
    bag_path = tmp_path / "test.bag"
    write_simple_bag(str(bag_path), "/velodyne_points", messages)

    reader = BagReader(str(bag_path))
    decoded = []
    for topic, msg_type, time_ns, raw in reader.messages():
        assert topic == "/velodyne_points"
        assert msg_type == "sensor_msgs/PointCloud2"
        decoded.append(decode_pointcloud2(raw))
    assert len(decoded) == 3
    for c, d in zip(clouds, decoded):
        np.testing.assert_allclose(d["xyz"], c, atol=1e-6)


def test_rosbag_dataset_sequential(tmp_path):
    from pylidar_slam_tpu.dataset.rosbag_reader import (encode_pointcloud2,
                                                        write_simple_bag)
    from pylidar_slam_tpu.dataset.rosbag_dataset import (RosbagConfig,
                                                         RosbagDatasetLoader)
    rng = np.random.default_rng(2)
    messages = [(int(1e9 * (i + 1)),
                 encode_pointcloud2(rng.normal(size=(100, 3)).astype(np.float32)))
                for i in range(4)]
    bag_path = tmp_path / "seq.bag"
    write_simple_bag(str(bag_path), "/points", messages)

    loader = RosbagDatasetLoader(RosbagConfig(
        file_path=str(bag_path), main_topic="/points", frame_size=2))
    (datasets, names), _, _, _ = loader.sequences()
    ds = datasets[0]
    d0 = ds[0]
    assert d0["numpy_pc"].shape == (200, 3)
    d1 = ds[1]
    assert d1["numpy_pc"].shape == (200, 3)
    # sequential access enforced
    with pytest.raises(Exception):
        _ = ds[5]


def test_nclt_binary_round_trip(tmp_path):
    from pylidar_slam_tpu.dataset.nclt_dataset import read_velodyne_file
    # encode points into NCLT int16 format: v = (x + 100) / 0.005
    pts = np.array([[1.0, 2.0, -1.5], [30.0, -20.0, 3.0]], np.float32)
    raw_x = ((pts[:, 0] + 100) / 0.005).astype(np.int16)
    raw_y = ((-pts[:, 1] + 100) / 0.005).astype(np.int16)  # y flip
    raw_z = ((-pts[:, 2] + 100) / 0.005).astype(np.int16)  # z flip
    refl = np.zeros(2, np.int16)
    interleaved = np.stack([raw_x, raw_y, raw_z, refl], axis=1).reshape(-1)
    path = tmp_path / "scan.bin"
    interleaved.tofile(str(path))
    back = read_velodyne_file(str(path))
    np.testing.assert_allclose(back, pts, atol=0.01)


def test_urban_loco_geodesy():
    from pylidar_slam_tpu.dataset.urban_loco_dataset import (ecef_to_enu,
                                                             llu_to_ecef)
    # A point 1 degree north of the origin is ~111 km north in ENU
    origin = np.array([114.0, 22.0, 0.0])  # lon, lat, alt (Hong Kong-ish)
    north = np.array([114.0, 23.0, 0.0])
    enu = ecef_to_enu(origin, llu_to_ecef(north))
    assert abs(enu[0]) < 1000
    assert 109000 < enu[1] < 112000

    east = np.array([115.0, 22.0, 0.0])
    enu_e = ecef_to_enu(origin, llu_to_ecef(east))
    assert 100000 < enu_e[0] < 105000  # ~103 km at lat 22


def test_urban_loco_ring_ids():
    from pylidar_slam_tpu.dataset.urban_loco_dataset import compute_ring_ids
    unique = np.array([10, 20, 30])
    theta_bins = np.array([20, 10, 30, 20, 99])
    rings = compute_ring_ids(theta_bins, unique)
    np.testing.assert_array_equal(rings, [1, 0, 2, 1, -1])


def test_kitti_calib_parsing(tmp_path):
    from pylidar_slam_tpu.dataset.kitti_dataset import (correct_scan,
                                                        read_calib_file)
    calib = tmp_path / "calib.txt"
    calib.write_text("P0: 1 0 0 0 0 1 0 0 0 0 1 0\n"
                     "Tr: 1 0 0 0.1 0 1 0 0.2 0 0 1 0.3\n")
    parsed = read_calib_file(str(calib))
    assert "Tr" in parsed and len(parsed["Tr"]) == 12

    rng = np.random.default_rng(3)
    scan = rng.normal(size=(100, 4)).astype(np.float32) * 10
    corrected = correct_scan(scan)
    # rotation preserves norms
    np.testing.assert_allclose(np.linalg.norm(corrected, axis=1),
                               np.linalg.norm(scan[:, :3], axis=1), rtol=1e-4)
    # rotation angle is exactly 0.205 degrees
    cos_angles = np.sum(corrected * scan[:, :3], axis=1) / \
        np.maximum(np.linalg.norm(scan[:, :3], axis=1) ** 2, 1e-9)
    np.testing.assert_allclose(np.arccos(np.clip(cos_angles, -1, 1)),
                               np.deg2rad(0.205), atol=1e-4)


def test_kitti_raw_drive_track(tmp_path):
    """kitti_raw_dir exposes unrectified raw scans + azimuth timestamps
    (reference kitti_dataset.py:251-274)."""
    from pylidar_slam_tpu.dataset.kitti_dataset import KITTIOdometrySequence

    # odometry tree: sequence 04 with one .bin scan
    seq_dir = tmp_path / "odom"
    velo = seq_dir / "sequences" / "04" / "velodyne"
    velo.mkdir(parents=True)
    rng = np.random.default_rng(7)
    scan = rng.normal(size=(256, 4)).astype(np.float32) * 5
    scan.tofile(velo / "000000.bin")

    # raw tree: drive for seq 04 with a txt scan
    raw_dir = tmp_path / "raw"
    raw_data = raw_dir / "2011_09_30/2011_09_30_drive_0016" / \
        "velodyne_points" / "data"
    raw_data.mkdir(parents=True)
    raw_scan = rng.normal(size=(128, 4)).astype(np.float32) * 5
    np.savetxt(raw_data / "0000000000.txt", raw_scan)

    seq = KITTIOdometrySequence(str(seq_dir), "04",
                                ground_truth_channel=None,
                                raw_dir=str(raw_dir))
    d = seq[0]
    assert d["raw_numpy_pc"].shape == (128, 3)
    ts = d["raw_numpy_pc_timestamps"]
    assert ts.shape == (128,)
    assert ts.min() >= -0.5 - 1e-6 and ts.max() <= 0.5 + 1e-6

    # without raw_dir the keys are absent
    seq2 = KITTIOdometrySequence(str(seq_dir), "04", ground_truth_channel=None)
    assert "raw_numpy_pc" not in seq2[0]


def _write_ctc_ply(path, pts, ts=None, binary=True):
    """Writes a CT-ICP-style PLY (x, y, z float + timestamp double)."""
    import struct
    n = len(pts)
    header = ["ply",
              "format binary_little_endian 1.0" if binary else "format ascii 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if ts is not None:
        header.append("property double timestamp")
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if binary:
            if ts is None:
                f.write(np.ascontiguousarray(pts, np.float32).tobytes())
            else:
                rec = np.zeros(n, dtype=[("xyz", np.float32, 3),
                                         ("t", "<f8")])
                rec["xyz"] = pts
                rec["t"] = ts
                f.write(rec.tobytes())
        else:
            for i in range(n):
                row = f"{pts[i,0]} {pts[i,1]} {pts[i,2]}"
                if ts is not None:
                    row += f" {ts[i]}"
                f.write((row + "\n").encode())


def test_ct_icp_dataset_loader(tmp_path):
    """CT-ICP PLY-dir dataset: frames + timestamps + KITTI-style GT
    (reference ct_icp_dataset.py capability, pure Python)."""
    from pylidar_slam_tpu.dataset.ct_icp_dataset import (CTICPConfig,
                                                         CTICPDatasetLoader)
    rng = np.random.default_rng(5)
    seq = tmp_path / "seq_a" / "frames"
    seq.mkdir(parents=True)
    gt = np.tile(np.eye(4), (3, 1, 1))
    for i in range(3):
        pts = rng.normal(size=(500, 3)).astype(np.float32) * 10
        ts = np.linspace(0.0, 0.1, 500) + i
        _write_ctc_ply(seq / f"frame_{i:05}.ply", pts, ts,
                       binary=(i % 2 == 0))
        gt[i, 0, 3] = i * 1.5
    np.savetxt(tmp_path / "seq_a" / "trajectory.txt",
               gt[:, :3, :].reshape(3, 12))

    loader = CTICPDatasetLoader(CTICPConfig(root_dir=str(tmp_path)))
    (datasets, names), _, _, _ = loader.sequences()
    assert names == ["seq_a"]
    ds = datasets[0]
    assert len(ds) == 3
    d = ds[1]
    assert d["numpy_pc"].shape == (500, 3)
    t = d["numpy_pc_timestamps"]
    assert t.min() >= 1.0 and t.max() <= 2.0  # normalized + frame index
    assert d["absolute_pose_gt"][0, 3] == 1.5
    rel = loader.get_ground_truth("seq_a")
    np.testing.assert_allclose(rel[1][0, 3], 1.5, atol=1e-9)


def _encode_inspvax(stamp_s, lon, lat, alt, azimuth, pitch, roll):
    """Inverse of urban_loco_dataset.decode_inspvax (same byte layout)."""
    import struct
    secs = int(stamp_s)
    nsecs = int((stamp_s - secs) * 1e9)
    out = struct.pack("<III", 0, secs, nsecs)          # std Header seq/secs/nsecs
    out += struct.pack("<I", 0)                        # frame_id: empty string
    out += struct.pack("<I", 7) + b"INSPVAX"           # novatel message_name
    out += struct.pack("<I", 4) + b"COM1"              # port
    out += struct.pack("<IfI", 0, 0.0, 2000)           # seq, idle, gps_week
    out += struct.pack("<d", 0.0)                      # gps_seconds
    out += struct.pack("<III", 0, 0, 0)                # status, reserved, sw
    out += struct.pack("<ii", 3, 56)                   # ins_status, pos_type
    out += struct.pack("<ddd", lat, lon, alt)
    out += struct.pack("<f", 0.0)                      # undulation
    out += struct.pack("<ddd", 0.0, 0.0, 0.0)          # velocities
    out += struct.pack("<ddd", roll, pitch, azimuth)
    return out


def test_urban_loco_inspvax_roundtrip():
    from pylidar_slam_tpu.dataset.urban_loco_dataset import decode_inspvax
    raw = _encode_inspvax(1234.25, 114.2, 22.3, 5.0, 33.0, 1.5, -0.5)
    decoded = decode_inspvax(raw)
    assert decoded is not None
    stamp, llu, ypr = decoded
    assert abs(stamp - 1234.25) < 1e-6
    np.testing.assert_allclose(llu, [114.2, 22.3, 5.0])
    np.testing.assert_allclose(ypr, [33.0, 1.5, -0.5])


def test_urban_loco_bag_end_to_end(tmp_path):
    """Full UrbanLoco path on a synthetic bag: PointCloud2 + INSPVAX ->
    frames + generated ENU ground truth (weak #8: end-to-end bag fixture)."""
    from pylidar_slam_tpu.dataset.rosbag_reader import (encode_pointcloud2,
                                                        write_multi_bag)
    from pylidar_slam_tpu.dataset.urban_loco_dataset import (
        SEQNAME_TO_FILENAME, UrbanLocoConfig, UrbanLocoDatasetLoader)

    seq = "HK-Data20190426-1"
    bag_path = tmp_path / SEQNAME_TO_FILENAME[seq]

    rng = np.random.default_rng(9)
    # spinning-scan pattern: full azimuth revolution per message
    n = 2000
    theta = np.linspace(-np.pi, np.pi, n, endpoint=False)
    r = rng.uniform(5.0, 30.0, n)
    pc_msgs = []
    for i in range(4):
        pts = np.stack([r * np.cos(theta), r * np.sin(theta),
                        rng.uniform(-2, 1, n)], -1).astype(np.float32)
        pc_msgs.append((int(1e9 * (10 + 0.1 * i)),
                        encode_pointcloud2(pts, stamp_s=10 + 0.1 * i)))
    # GPS: moving north ~5.5 m/s at constant heading, 2 Hz
    gps_msgs = []
    for k in range(10):
        t = 9.9 + 0.05 * k
        gps_msgs.append((int(1e9 * t), _encode_inspvax(
            t, 114.2, 22.3 + 0.05 * k * 5.0e-5, 4.0, 90.0, 0.0, 0.0)))

    write_multi_bag(str(bag_path), [
        ("/velodyne_points_0", "sensor_msgs/PointCloud2", pc_msgs),
        ("/novatel_data/inspvax", "novatel_msgs/INSPVAX", gps_msgs)])

    loader = UrbanLocoDatasetLoader(UrbanLocoConfig(
        root_dir=str(tmp_path), train_sequences=[seq]))
    # 1. GT generation from the bag
    loader.generate_ground_truth([seq])
    gt_rel = loader.get_ground_truth(seq)
    assert gt_rel is not None and len(gt_rel) == 4
    # constant-velocity northward motion: consecutive relative translations
    # are equal and ~0.55 m per scan (5.5 m/s * 0.1 s)
    steps = np.linalg.norm(gt_rel[1:, :3, 3], axis=-1)
    np.testing.assert_allclose(steps, steps[0], rtol=0.05)
    assert 0.3 < steps[0] < 0.9

    # 2. frame reading with azimuth-synchronized re-cutting
    (datasets, names), _, _, _ = loader.sequences()
    ds = datasets[0]
    d0 = ds[0]
    pc = d0["numpy_pc"]
    assert pc.ndim == 2 and pc.shape[1] == 3 and pc.shape[0] > 1000


def test_ply_multi_element_header(tmp_path):
    """Standard vertex+face PLY (Open3D/MeshLab layout): the parser must
    consume the FULL header before reading the binary payload, else the
    vertex data is read from mid-header (ADVICE r2: garbage coordinates)."""
    from pylidar_slam_tpu.dataset.ply_io import (ply_to_pointcloud,
                                                 read_ply_fields)
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(100, 3)).astype(np.float32) * 5.0
    path = tmp_path / "mesh.ply"
    header = "\n".join([
        "ply",
        "format binary_little_endian 1.0",
        "comment exported by some mesh tool",
        "element vertex 100",
        "property float x", "property float y", "property float z",
        "element face 10",
        "property list uchar int vertex_indices",
        "end_header", ""])
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(np.ascontiguousarray(pts, np.float32).tobytes())
        for _ in range(10):  # trailing face payload (ignored)
            f.write(bytes([3]) + np.zeros(3, np.int32).tobytes())
    fields = read_ply_fields(str(path))
    out, ts = ply_to_pointcloud(fields)
    np.testing.assert_allclose(out, pts, atol=1e-7)
    assert ts is None
