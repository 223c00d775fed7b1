"""Input readers: the reference's LogReader family (GUI/Tools/LogReader.h:31-85)
rebuilt for the TPU host.

  * KlgLogReader — .klg binary logs via the native C++ decoder
    (native/klgio.cpp, zlib+libjpeg), with a pure-Python fallback
    (GUI/Tools/KlgLogReader.cpp:41-128);
  * ImageLogReader — Color####.png + Depth####.exr/png [+ Mask####.png]
    directories with prefix/extension autodetection, start-index detection,
    calibration.txt discovery, and a background prefetch thread
    (GUI/Tools/ImageLogReader.{h,cpp}, buffering loop :179-217);
  * SyntheticLogReader — wraps io.synthetic sequences behind the same interface
    (replaces LiveLogReader: no OpenNI camera exists on a TPU host — explicit
    non-goal, SURVEY.md §7).

Frames are dicts {rgb uint8 (H,W,3) RGB-order, depth float32 meters,
mask uint8 | None, timestamp int} — the reference's FrameData
(Core/FrameData.h:25-42).
"""

from __future__ import annotations

import ctypes
import glob
import os
import queue
import re
import threading

import numpy as np

_NATIVE = None


def _load_native():
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libklgio.so")
    if not os.path.exists(path):
        # try building it
        import subprocess

        try:
            subprocess.run(["make", "-C", os.path.dirname(path)], check=True, capture_output=True)
        except Exception:
            _NATIVE = False
            return False
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _NATIVE = False
        return False
    lib.klg_open.restype = ctypes.c_void_p
    lib.klg_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.klg_num_frames.argtypes = [ctypes.c_void_p]
    lib.klg_next.restype = ctypes.c_int
    lib.klg_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.klg_skip.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.klg_seek.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.klg_close.argtypes = [ctypes.c_void_p]
    lib.klg_write.restype = ctypes.c_int
    lib.klg_write.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
    ]
    _NATIVE = lib
    return lib


def write_klg(path: str, frames: list[dict], width: int, height: int, compress: bool = True):
    """Encode frames into a .klg log (dataset-tools convert_imagesToKlg analogue;
    also the fixture generator for tests)."""
    lib = _load_native()
    n = len(frames)
    ts = np.asarray([f.get("timestamp", i) for i, f in enumerate(frames)], np.int64)
    depths = np.stack([np.round(f["depth"] * 1000.0).astype(np.uint16) for f in frames])
    rgbs = np.stack([f["rgb"].astype(np.uint8) for f in frames])
    if lib:
        rc = lib.klg_write(
            path.encode(), n, width, height,
            ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            np.ascontiguousarray(depths).ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            np.ascontiguousarray(rgbs).ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            1 if compress else 0,
        )
        if rc != 0:
            raise IOError(f"klg_write failed: {rc}")
        return
    # python fallback
    import struct
    import zlib

    with open(path, "wb") as f:
        f.write(struct.pack("<i", n))
        for i in range(n):
            d = depths[i].tobytes()
            if compress:
                d = zlib.compress(d)
            r = rgbs[i].tobytes()
            f.write(struct.pack("<qii", int(ts[i]), len(d), len(r)))
            f.write(d)
            f.write(r)


class LogReader:
    """Abstract reader interface (GUI/Tools/LogReader.h:31-85)."""

    has_depth_filled = False

    def __init__(self):
        self.current_frame = 0
        self.flip_colors = False

    def get_next(self) -> dict:
        raise NotImplementedError

    def get_previous(self) -> dict:
        """Step one frame BACKWARD and return it ('-r' rewind playback,
        LogReader::getPrevious — the reference keeps a file-pointer stack,
        KlgLogReader.cpp:41-128).  Optional: only klg/image readers support it."""
        raise NotImplementedError

    def has_more(self) -> bool:
        raise NotImplementedError

    def num_frames(self) -> int:
        raise NotImplementedError

    def fast_forward(self, frame: int) -> None:
        while self.current_frame < frame and self.has_more():
            self.get_next()

    def rewind(self) -> None:
        raise NotImplementedError

    def calibration_file(self) -> str | None:
        return None


class KlgLogReader(LogReader):
    def __init__(self, path: str, width: int = 640, height: int = 480):
        super().__init__()
        self.path = path
        self.width = width
        self.height = height
        # frame-offset stack for the python-fallback get_previous (the
        # reference's file-pointer stack, KlgLogReader.cpp:41-128); kept even
        # on the native path so a runtime fallback switch works
        self._offsets: list[int] = []
        self._lib = _load_native()
        if self._lib:
            self._h = self._lib.klg_open(path.encode(), width, height)
            if not self._h:
                raise IOError(f"cannot open klg: {path}")
            self._n = self._lib.klg_num_frames(self._h)
        else:
            self._fp = open(path, "rb")
            import struct

            self._n = struct.unpack("<i", self._fp.read(4))[0]

    def num_frames(self) -> int:
        return self._n

    def has_more(self) -> bool:
        return self.current_frame < self._n

    def get_next(self) -> dict:
        if self._lib:
            depth = np.empty((self.height, self.width), np.float32)
            rgb = np.empty((self.height, self.width, 3), np.uint8)
            ts = ctypes.c_int64(0)
            rc = self._lib.klg_next(
                self._h,
                depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.byref(ts),
            )
            if rc != 0:
                raise IOError(f"klg_next failed: {rc}")
            self.current_frame += 1
            if self.flip_colors:
                rgb = rgb[..., ::-1]
            return {"rgb": rgb, "depth": depth, "mask": None, "timestamp": int(ts.value)}
        return self._get_next_python()

    def get_previous(self) -> dict:
        """Seek one frame back and return it (rewind '-r' playback)."""
        i = max(self.current_frame - 2, 0)
        if self._lib:
            self._lib.klg_seek(self._h, i)
            self.current_frame = i
            return self.get_next()
        # python fallback: pop the offset stack (frames are only ever read
        # forward, so the stack holds every frame start up to current_frame)
        while len(self._offsets) > i + 1:
            self._offsets.pop()
        self._fp.seek(self._offsets[i] if self._offsets else 4)
        self.current_frame = i
        return self._get_next_python()

    def _get_next_python(self) -> dict:
        import struct
        import zlib

        import cv2

        npix = self.width * self.height
        if len(self._offsets) <= self.current_frame:
            self._offsets.append(self._fp.tell())
        ts, dsize, rsize = struct.unpack("<qii", self._fp.read(16))
        dbuf = self._fp.read(dsize)
        rbuf = self._fp.read(rsize) if rsize > 0 else b""
        if dsize != npix * 2:
            dbuf = zlib.decompress(dbuf)
        depth = (
            np.frombuffer(dbuf, np.uint16).reshape(self.height, self.width).astype(np.float32)
            * 0.001
        )
        if rsize == 0:
            rgb = np.zeros((self.height, self.width, 3), np.uint8)
        elif rsize == npix * 3:
            rgb = np.frombuffer(rbuf, np.uint8).reshape(self.height, self.width, 3)
        else:
            bgr = cv2.imdecode(np.frombuffer(rbuf, np.uint8), cv2.IMREAD_COLOR)
            rgb = bgr[..., ::-1].copy()
        self.current_frame += 1
        if self.flip_colors:
            rgb = rgb[..., ::-1]
        return {"rgb": rgb, "depth": depth, "mask": None, "timestamp": int(ts)}

    def fast_forward(self, frame: int) -> None:
        if self._lib:
            n = frame - self.current_frame
            if n > 0:
                self.current_frame = self._lib.klg_skip(self._h, n)
        else:
            super().fast_forward(frame)

    def rewind(self) -> None:
        if self._lib:
            self._lib.klg_seek(self._h, 0)
        else:
            self._fp.seek(4)
        self.current_frame = 0

    def close(self):
        if self._lib and self._h:
            self._lib.klg_close(self._h)
            self._h = None


_NUM_RE = re.compile(r"(\d+)\.(\w+)$")


class ImageLogReader(LogReader):
    """Directory dataset reader with background prefetching.

    Autodetects color/depth/mask filename prefixes and extensions
    (ImageLogReader.cpp:75-117), 0-vs-1 start index (:130-140), and
    `calibration.txt` next to the data (:146-148).  Depth: .exr (float meters)
    or 16-bit png converted at x0.0006 — the reference's hard-coded scale for
    the car4/room4 Blender datasets (ImageLogReader.cpp:260); override with
    `png_depth_scale` (CLI `-pngScale`) for mm-style x0.001 datasets.
    Timestamps synthesized at `rate_hz` (default 24)."""

    def __init__(
        self,
        directory: str,
        mask_directory: str | None = None,
        depth_directory: str | None = None,
        color_prefix: str | None = None,
        depth_prefix: str | None = None,
        mask_prefix: str | None = None,
        rate_hz: float = 24.0,
        prefetch: int = 15,
        png_depth_scale: float = 0.0006,
        max_masks: int | None = None,
        index_width: int | None = None,
    ):
        """`depth_directory`: separate depth dir (-depthdir, ==dir if None).
        `max_masks`: stop providing masks from this frame index on (-nm N;
        -nm without a value = 0 = ignore masks entirely,
        ImageLogReader.h:69-70 + MainController.cpp:150-156).
        `index_width`: number of digits in the frame index (-indexW, default
        autodetect) — used to disambiguate when several numbered series share
        a prefix."""
        super().__init__()
        self.dir = directory
        self.mask_dir = mask_directory
        self.rate_hz = rate_hz
        self.png_depth_scale = png_depth_scale
        self.max_masks = max_masks
        self.index_width = index_width

        self.color_files = self._detect(directory, color_prefix, ("Color", "color", "rgb", "Rgb"))
        self.depth_files = self._detect(
            depth_directory or directory, depth_prefix, ("Depth", "depth")
        )
        if len(self.color_files) != len(self.depth_files):
            raise IOError(
                f"color/depth count mismatch: {len(self.color_files)} vs {len(self.depth_files)}"
            )
        self.mask_files: list[str] | None = None
        if mask_directory and (max_masks is None or max_masks > 0):
            self.mask_files = self._detect(mask_directory, mask_prefix, ("Mask", "mask"))
            if len(self.mask_files) < len(self.color_files):
                raise IOError("fewer masks than frames")
        self._n = len(self.color_files)
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._prefetch_loop, daemon=True)
        self._next_to_load = 0
        self._thread.start()

    def _detect(self, directory: str, prefix: str | None, candidates) -> list[str]:
        for p in ([prefix] if prefix else candidates):
            for ext in ("png", "jpg", "jpeg", "exr", "tiff"):
                files = sorted(glob.glob(os.path.join(directory, f"{p}*.{ext}")))
                if files and self.index_width:
                    files = [
                        f for f in files
                        if (m := _NUM_RE.search(f)) and len(m.group(1)) == self.index_width
                    ]
                if files:
                    return files
        raise IOError(f"no image files with prefixes {candidates} in {directory}")

    def calibration_file(self) -> str | None:
        cal = os.path.join(self.dir, "calibration.txt")
        return cal if os.path.exists(cal) else None

    def _load(self, i: int) -> dict:
        import cv2

        bgr = cv2.imread(self.color_files[i], cv2.IMREAD_COLOR)
        rgb = bgr[..., ::-1].copy()
        dpath = self.depth_files[i]
        if dpath.endswith(".exr"):
            os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
            d = cv2.imread(dpath, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
            if d is None:
                raise IOError(f"cannot read {dpath} (EXR support?)")
            if d.ndim == 3:
                d = d[..., 0]
            depth = d.astype(np.float32)
        else:
            d = cv2.imread(dpath, cv2.IMREAD_ANYDEPTH)
            depth = d.astype(np.float32) * self.png_depth_scale
        mask = None
        if self.mask_files and (self.max_masks is None or i < self.max_masks):
            mask = cv2.imread(self.mask_files[i], cv2.IMREAD_GRAYSCALE)
        return {
            "rgb": rgb,
            "depth": depth,
            "mask": mask,
            "timestamp": int(i * 1e6 / self.rate_hz),
        }

    def _prefetch_loop(self):
        while not self._stop.is_set():
            i = self._next_to_load
            if i >= self._n:
                return
            frame = self._load(i)
            self._next_to_load += 1
            while not self._stop.is_set():
                try:
                    self._queue.put((i, frame), timeout=0.25)
                    break
                except queue.Full:
                    continue

    def num_frames(self) -> int:
        return self._n

    def has_more(self) -> bool:
        return self.current_frame < self._n

    def get_next(self) -> dict:
        i, frame = self._queue.get()
        # queue is strictly ordered; i == current_frame unless rewound
        self.current_frame = i + 1
        if self.flip_colors:
            frame = dict(frame, rgb=frame["rgb"][..., ::-1])
        return frame

    def get_previous(self) -> dict:
        """Random-access backward step ('-r'): bypasses the prefetch queue
        (which only runs forward; by the time playback reverses at the log end
        the queue is drained and the prefetch thread has exited)."""
        i = max(self.current_frame - 2, 0)
        frame = self._load(i)
        self.current_frame = i + 1
        if self.flip_colors:
            frame = dict(frame, rgb=frame["rgb"][..., ::-1])
        return frame

    def rewind(self) -> None:
        self._stop.set()
        self._thread.join()
        self._queue = queue.Queue(maxsize=self._queue.maxsize)
        self._stop = threading.Event()
        self._next_to_load = 0
        self.current_frame = 0
        self._thread = threading.Thread(target=self._prefetch_loop, daemon=True)
        self._thread.start()


class SyntheticLogReader(LogReader):
    """In-memory synthetic sequences behind the LogReader interface."""

    def __init__(self, frames: list[dict]):
        super().__init__()
        self.frames = frames

    def num_frames(self) -> int:
        return len(self.frames)

    def has_more(self) -> bool:
        return self.current_frame < len(self.frames)

    def get_next(self) -> dict:
        f = self.frames[self.current_frame]
        self.current_frame += 1
        return f

    def rewind(self) -> None:
        self.current_frame = 0


def load_calibration(path: str) -> tuple[float, float, float, float, int | None, int | None]:
    """Parse `fx fy cx cy [w h]` (MainController::loadCalibration,
    GUI/MainController.cpp:293-312)."""
    with open(path) as f:
        parts = f.read().split()
    fx, fy, cx, cy = map(float, parts[:4])
    w = int(parts[4]) if len(parts) > 4 else None
    h = int(parts[5]) if len(parts) > 5 else None
    return fx, fy, cx, cy, w, h
