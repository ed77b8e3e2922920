"""Host-side point-cloud IO: CSV, ASCII VTK, PLY, PCD.

Counterpart of libpointmatcher's ``IO.cpp`` (CSV/VTK/PLY/PCD loaders with
labeled descriptors, ``IO.cpp:380-930``) — numpy-based, returning plain
``(points, extras)`` numpy arrays that callers pad into PointBatches. Kept
deliberately free of JAX so data loading never touches the device.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

Extras = Dict[str, np.ndarray]


def load_cloud(path: str) -> Tuple[np.ndarray, Extras]:
    """Dispatch by extension (≙ ``DataPoints::load``, ``IO.cpp:380-386``)."""
    p = str(path).lower()
    if p.endswith(".csv"):
        return load_csv(path)
    if p.endswith(".vtk"):
        return load_vtk(path)
    if p.endswith(".ply"):
        return load_ply(path)
    if p.endswith(".pcd"):
        return load_pcd(path)
    raise ValueError(f"unsupported point cloud format: {path}")


def load_csv(path: str) -> Tuple[np.ndarray, Extras]:
    """CSV with an optional header naming columns (x, y, z + descriptors).

    Headerless numeric files (like the reference's ``car_cloud400.csv``) are
    treated as plain x y z rows, matching ``CSVDataPointsLoader``'s
    auto-detection (``IO.cpp``)."""
    with open(path, "r") as f:
        header = f.readline().strip()
    delim = "," if "," in header else None
    names = [h.strip() for h in (header.split(",") if delim else header.split())]

    def _numeric(tok: str) -> bool:
        try:
            float(tok)
            return True
        except ValueError:
            return False

    if names and all(_numeric(n) for n in names):
        data = np.loadtxt(path, delimiter=delim, dtype=np.float32, ndmin=2)
        if data.shape[1] == 2:
            data = np.c_[data, np.zeros((len(data), 1), np.float32)]
        return data[:, :3].astype(np.float32), {}

    data = np.loadtxt(path, skiprows=1, delimiter=delim, dtype=np.float32, ndmin=2)
    cols = {n.lower(): i for i, n in enumerate(names)}
    if not {"x", "y"} <= cols.keys():
        raise ValueError(f"CSV must name x,y(,z) columns, got {names}")
    idx = [cols["x"], cols["y"]]
    if "z" in cols:
        idx.append(cols["z"])
    pts = data[:, idx]
    if pts.shape[1] == 2:
        pts = np.c_[pts, np.zeros((len(pts), 1), np.float32)]
    extras: Extras = {}
    if {"nx", "ny", "nz"} <= cols.keys():
        extras["normals"] = data[:, [cols["nx"], cols["ny"], cols["nz"]]]
    return pts.astype(np.float32), extras


def save_csv(path: str, points: np.ndarray, extras: Optional[Extras] = None) -> None:
    extras = extras or {}
    names = ["x", "y", "z"]
    arrays = [np.asarray(points, np.float32)]
    if "normals" in extras:
        names += ["nx", "ny", "nz"]
        arrays.append(np.asarray(extras["normals"], np.float32))
    data = np.concatenate(arrays, axis=1)
    np.savetxt(path, data, delimiter=",", header=",".join(names), comments="")


def load_vtk(path: str) -> Tuple[np.ndarray, Extras]:
    """ASCII legacy VTK polydata/unstructured points (the reference's test
    clouds ``cloud.0000*.vtk``)."""
    with open(path, "r") as f:
        text = f.read()
    m = re.search(r"POINTS\s+(\d+)\s+\w+", text)
    if not m:
        raise ValueError(f"no POINTS section in {path}")
    n = int(m.group(1))
    tail = text[m.end():]
    # Parse exactly 3n floats following the POINTS header.
    tokens = tail.split()
    pts = np.array(tokens[: n * 3], dtype=np.float32).reshape(n, 3)
    extras: Extras = {}
    nm = re.search(r"NORMALS\s+\w+\s+\w+", text)
    if nm:
        ntokens = text[nm.end():].split()
        extras["normals"] = np.array(ntokens[: n * 3], dtype=np.float32).reshape(n, 3)
    return pts, extras


_PLY_DTYPES = {
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "i2", "ushort": "u2", "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
}


def load_ply(path: str) -> Tuple[np.ndarray, Extras]:
    """PLY (ascii or binary_little_endian), vertex element only."""
    with open(path, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header_lines.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header_lines if l.startswith("format"))
        n = 0
        props = []
        in_vertex = False
        for l in header_lines:
            if l.startswith("element"):
                parts = l.split()
                in_vertex = parts[1] == "vertex"
                if in_vertex:
                    n = int(parts[2])
            elif l.startswith("property") and in_vertex:
                _, typ, name = l.split()[:3]
                props.append((name, _PLY_DTYPES[typ]))
        if fmt == "ascii":
            rows = []
            for _ in range(n):
                rows.append(f.readline().split())
            arr = np.array(rows, dtype=np.float64)
            rec = {name: arr[:, i] for i, (name, _) in enumerate(props)}
        elif fmt == "binary_little_endian":
            dt = np.dtype([(name, "<" + d) for name, d in props])
            raw = np.frombuffer(f.read(n * dt.itemsize), dtype=dt, count=n)
            rec = {name: raw[name].astype(np.float64) for name, _ in props}
        else:
            raise ValueError(f"unsupported PLY format {fmt}")
    pts = np.stack([rec["x"], rec["y"], rec["z"]], axis=1).astype(np.float32)
    extras: Extras = {}
    if {"nx", "ny", "nz"} <= rec.keys():
        extras["normals"] = np.stack([rec["nx"], rec["ny"], rec["nz"]], axis=1).astype(np.float32)
    if {"red", "green", "blue"} <= rec.keys():
        extras["colors"] = (
            np.stack([rec["red"], rec["green"], rec["blue"]], axis=1) / 255.0
        ).astype(np.float32)
    return pts, extras


def save_ply(path: str, points: np.ndarray, extras: Optional[Extras] = None) -> None:
    """Binary little-endian PLY with optional normals/colors — the map-save
    format (≙ the reference saving maps/submaps as PCD/PLY,
    ``SlamWrapper.cpp:499-517``)."""
    extras = extras or {}
    points = np.asarray(points, np.float32)
    n = len(points)
    fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    cols = [points[:, 0], points[:, 1], points[:, 2]]
    if "normals" in extras:
        nm = np.asarray(extras["normals"], np.float32)
        fields += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
        cols += [nm[:, 0], nm[:, 1], nm[:, 2]]
    if "colors" in extras:
        c = (np.clip(np.asarray(extras["colors"]), 0, 1) * 255).astype(np.uint8)
        fields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
        cols += [c[:, 0], c[:, 1], c[:, 2]]
    rec = np.empty(n, dtype=np.dtype(fields))
    for (name, _), col in zip(fields, cols):
        rec[name] = col
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        type_names = {"<f4": "float", "u1": "uchar"}
        for name, dt in fields:
            f.write(f"property {type_names[dt]} {name}\n".encode())
        f.write(b"end_header\n")
        f.write(rec.tobytes())


def load_pcd(path: str) -> Tuple[np.ndarray, Extras]:
    """PCD v0.7, ascii or binary (uncompressed)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if not line or line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key] = val
            if key == "DATA":
                break
        fields = header["FIELDS"].split()
        sizes = list(map(int, header["SIZE"].split()))
        types = header["TYPE"].split()
        n = int(header["POINTS"])
        np_types = {("F", 4): "<f4", ("F", 8): "<f8", ("U", 1): "u1", ("U", 4): "<u4", ("I", 4): "<i4"}
        dt = np.dtype([(fld, np_types[(t, s)]) for fld, t, s in zip(fields, types, sizes)])
        if header["DATA"] == "ascii":
            arr = np.loadtxt(f, dtype=np.float64, ndmin=2)
            rec = {fld: arr[:, i] for i, fld in enumerate(fields)}
        elif header["DATA"] == "binary":
            raw = np.frombuffer(f.read(n * dt.itemsize), dtype=dt, count=n)
            rec = {fld: raw[fld].astype(np.float64) for fld in fields}
        else:
            raise ValueError(f"unsupported PCD data mode {header['DATA']}")
    pts = np.stack([rec["x"], rec["y"], rec["z"]], axis=1).astype(np.float32)
    extras: Extras = {}
    if {"normal_x", "normal_y", "normal_z"} <= rec.keys():
        extras["normals"] = np.stack(
            [rec["normal_x"], rec["normal_y"], rec["normal_z"]], axis=1
        ).astype(np.float32)
    return pts, extras


def save_pcd(path: str, points: np.ndarray, extras: Optional[Extras] = None) -> None:
    """Binary PCD v0.7 (x y z [+ normals])."""
    extras = extras or {}
    points = np.asarray(points, np.float32)
    n = len(points)
    fields = ["x", "y", "z"]
    cols = [points[:, 0], points[:, 1], points[:, 2]]
    if "normals" in extras:
        nm = np.asarray(extras["normals"], np.float32)
        fields += ["normal_x", "normal_y", "normal_z"]
        cols += [nm[:, 0], nm[:, 1], nm[:, 2]]
    dt = np.dtype([(fld, "<f4") for fld in fields])
    rec = np.empty(n, dtype=dt)
    for fld, col in zip(fields, cols):
        rec[fld] = col
    with open(path, "wb") as f:
        f.write(b"# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n")
        f.write(f"FIELDS {' '.join(fields)}\n".encode())
        f.write(f"SIZE {' '.join(['4'] * len(fields))}\n".encode())
        f.write(f"TYPE {' '.join(['F'] * len(fields))}\n".encode())
        f.write(f"COUNT {' '.join(['1'] * len(fields))}\n".encode())
        f.write(f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n".encode())
        f.write(f"POINTS {n}\nDATA binary\n".encode())
        f.write(rec.tobytes())
