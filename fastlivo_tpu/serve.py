"""Online serving mode: a socket transport feeding the pipeline live.

The reference runs as a live ROS node (laserMapping.cpp:1139: TCPROS
subscriptions -> callbacks -> buffers -> the processing loop). This is
the TPU build's equivalent transport layer: a length-prefixed binary
protocol over a Unix or TCP socket, decoded into the same
`Pipeline.push_*` callbacks, with odometry streamed back per frame —
so a robot-side client replaces rosbag replay with zero pipeline
changes.

Wire format (little-endian), one message per frame:
    u32 total_len | u8 kind | payload
  kind 0 IMU:   f64 stamp | f32[3] acc | f32[3] gyr
  kind 1 LIDAR: f64 stamp | u32 n | f32[n,3] xyz | f32[n] t_rel
  kind 2 IMAGE: f64 stamp | u16 h | u16 w | u8 ch | u8[h,w,ch] (BGR/gray)
  kind 3 FLUSH: (empty) — force processing of everything buffered

Responses (server -> client), one JSON line per lidar frame:
    {"t": ..., "pos": [x,y,z], "quat": [w,x,y,z], "n_active": N}
"""
from __future__ import annotations

import json
import socket
import struct
import threading
from collections import deque

import numpy as np

from .config import Config
from .pipeline import Pipeline

IMU, LIDAR, IMAGE, FLUSH = 0, 1, 2, 3
MAX_MSG = 256 << 20  # reject absurd length prefixes (corrupt stream)


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def encode_imu(stamp: float, acc, gyr) -> bytes:
    payload = struct.pack("<Bd", IMU, stamp)
    payload += np.asarray(acc, np.float32).tobytes()
    payload += np.asarray(gyr, np.float32).tobytes()
    return struct.pack("<I", len(payload)) + payload


def encode_lidar(stamp: float, pts, t_rel) -> bytes:
    pts = np.ascontiguousarray(pts, np.float32)
    t_rel = np.ascontiguousarray(t_rel, np.float32)
    payload = struct.pack("<BdI", LIDAR, stamp, len(pts))
    payload += pts.tobytes() + t_rel.tobytes()
    return struct.pack("<I", len(payload)) + payload


def encode_image(stamp: float, img) -> bytes:
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    payload = struct.pack("<BdHHB", IMAGE, stamp, h, w, ch) + img.tobytes()
    return struct.pack("<I", len(payload)) + payload


def encode_flush() -> bytes:
    return struct.pack("<I", 1) + struct.pack("<B", FLUSH)


class _Sender:
    """Per-connection outbound queue + sender thread.

    Broadcasts APPEND (non-blocking) and the thread drains with
    blocking sendall — a stalled consumer fills only its own bounded
    queue and gets dropped, instead of wedging every connection behind
    one global send lock (review r5). Also serializes ALL writes to
    one socket (broadcast + direct replies), so lines cannot
    interleave."""

    MAX_QUEUE = 4096  # lines; ~0.5 MB of odometry backlog

    def __init__(self, conn):
        self.conn = conn
        self._q = deque()
        self._cv = threading.Condition()
        self.dead = False       # hard drop (stalled/broken consumer)
        self.closing = False    # graceful: drain queued lines, then stop
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def send(self, data: bytes) -> None:
        with self._cv:
            if self.dead:
                return
            if len(self._q) >= self.MAX_QUEUE:
                # consumer stopped reading: drop it rather than block
                self.dead = True
                self._q.clear()
            else:
                self._q.append(data)
            self._cv.notify()

    def close(self) -> None:
        """Graceful shutdown: queued replies (e.g. the bad-length error
        line) drain before the socket closes — a hard stop raced the
        reply with conn.close() and the client never saw it."""
        with self._cv:
            self.closing = True
            self._cv.notify()
        self._thread.join(2.0)

    def _run(self):
        while True:
            with self._cv:
                while not self._q and not (self.dead or self.closing):
                    self._cv.wait()
                if not self._q:
                    return  # dead or closing, queue drained
                if self.dead:
                    return  # hard drop: pending data discarded
                data = self._q.popleft()
            try:
                self.conn.sendall(data)
            except OSError:
                with self._cv:
                    self.dead = True
                    self._q.clear()
                return


class Server:
    """Multi-connection server driving one Pipeline instance.

    Each connection gets a reader thread (the reference's ROS
    callback-thread role, laserMapping.cpp:424-518); any connection may
    publish sensor messages and EVERY connection receives the per-frame
    odometry JSON broadcast (the rostopic pub/sub role — rviz-style
    consumers subscribe by just connecting). Estimation itself is
    serialized by a lock, so the pipeline sees the reference's
    single-threaded spinOnce cadence (:1260-1267)."""

    def __init__(self, cfg: Config, address, log_dir=None, mesh=None,
                 sharded_map: bool = False, autosave=None,
                 autosave_every: int = 600):
        """`autosave`: optional .npz path — every `autosave_every`
        frames (and at server shutdown) the full estimator snapshots
        to it (state + maps + IMU calib; io/checkpoint format, so
        `--load-ckpt` / `Pipeline.warm_start` resumes from a crash).
        Arrays materialize synchronously under the pipeline lock (a
        donated map buffer is invalid after the NEXT frame), then
        compression + the atomic file replace run on a worker thread
        off the estimation path."""
        self.pipe = Pipeline(cfg, log_dir=log_dir, mesh=mesh,
                             sharded_map=sharded_map)
        self.autosave = autosave
        self.autosave_every = max(int(autosave_every), 1)
        self._frames_since_save = 0
        self._saver = None  # lazy single-worker executor
        if isinstance(address, tuple):
            self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        else:
            import os

            if os.path.exists(address):
                os.unlink(address)  # stale socket from a prior run
            self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self.sock.bind(address)
        self.sock.listen(8)
        self.address = self.sock.getsockname()
        self._thread = None
        self._done = threading.Event()
        self._conns: list = []  # live connections (reader bookkeeping)
        self._senders: dict = {}  # conn -> _Sender (broadcast targets)
        self._conns_lock = threading.Lock()
        self._pipe_lock = threading.Lock()  # serializes estimation
        self._n_ever = 0

    def serve_forever(self):
        """Accept loop; returns (and sets `done`) once at least one
        connection existed and all have closed."""
        try:
            self.sock.settimeout(0.2)
            while True:
                try:
                    conn, _ = self.sock.accept()
                except socket.timeout:
                    with self._conns_lock:
                        if self._n_ever and not self._conns:
                            break
                    continue
                self._n_ever += 1
                with self._conns_lock:
                    self._conns.append(conn)
                    self._senders[conn] = _Sender(conn)
                threading.Thread(target=self._reader, args=(conn,),
                                 daemon=True).start()
        finally:
            self.sock.close()
            if self.autosave:
                # shutdown snapshot: the crash-recovery artifact is
                # only useful if it also captures the final state
                with self._pipe_lock:
                    self._snapshot()
                if self._saver is not None:
                    self._saver.shutdown(wait=True)
            self._done.set()

    def _reader(self, conn):
        try:
            self._serve_conn(conn)
        finally:
            with self._conns_lock:
                if conn in self._conns:
                    self._conns.remove(conn)
                s = self._senders.pop(conn, None)
            if s is not None:
                s.close()
            try:
                conn.close()
            except OSError:
                pass

    def _broadcast(self, data: bytes):
        """Non-blocking: append to every connection's sender queue."""
        with self._conns_lock:
            senders = list(self._senders.values())
        for s in senders:
            s.send(data)

    def _send_to(self, conn, data: bytes):
        """Direct reply to one connection, through its sender queue (so
        replies never interleave with a concurrent broadcast)."""
        with self._conns_lock:
            s = self._senders.get(conn)
        if s is not None:
            s.send(data)

    def start_background(self):
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()
        return self

    def wait(self, timeout=None):
        self._done.wait(timeout)

    def _serve_conn(self, conn: socket.socket):
        pipe = self.pipe
        while True:
            hdr = _recv_exact(conn, 4)
            if hdr is None:
                break
            (n,) = struct.unpack("<I", hdr)
            if n == 0 or n > MAX_MSG:
                self._send_to(conn, b'{"error": "bad message length"}\n')
                break
            payload = _recv_exact(conn, n)
            if payload is None:
                break
            kind = payload[0]
            # ingestion + estimation serialized across reader threads
            # (the pipeline is the reference's single spinOnce loop)
            with self._pipe_lock:
                if kind == IMU:
                    (stamp,) = struct.unpack_from("<d", payload, 1)
                    acc = np.frombuffer(payload, np.float32, 3, 9)
                    gyr = np.frombuffer(payload, np.float32, 3, 21)
                    pipe.push_imu(stamp, acc, gyr)
                elif kind == LIDAR:
                    stamp, cnt = struct.unpack_from("<dI", payload, 1)
                    off = 1 + 8 + 4
                    pts = np.frombuffer(payload, np.float32, cnt * 3, off)
                    pts = pts.reshape(cnt, 3)
                    t_rel = np.frombuffer(
                        payload, np.float32, cnt, off + cnt * 12
                    ).astype(np.float64)
                    pipe.push_lidar(stamp, pts, t_rel)
                elif kind == IMAGE:
                    stamp, h, w, ch = struct.unpack_from("<dHHB", payload, 1)
                    img = np.frombuffer(payload, np.uint8, h * w * ch, 14)
                    img = img.reshape(h, w, ch)
                    if ch == 1:
                        img = img[..., 0]
                    pipe.push_img(stamp, img)
                elif kind == FLUSH:
                    pass
                outs = pipe.spin()
                if kind == FLUSH:
                    # resolve any deferred frame (async_read mode) so a
                    # flush is a true barrier
                    outs = outs + pipe.finish()
                # broadcast INSIDE the pipe lock: queue appends are
                # non-blocking, and this guarantees globally in-order
                # odometry lines across publisher threads (review r5)
                for out in outs:
                    line = json.dumps({
                        "t": out.t,
                        "pos": [float(v) for v in out.pos],
                        "quat": [float(v) for v in out.quat],
                        "n_active": out.n_active,
                        # online filter health: posterior point-to-plane
                        # residual RMS (degeneracy/divergence signal)
                        "res_rms": round(out.res_rms, 6),
                        # divergence-watchdog restarts so far (0 with
                        # the watchdog off; a step-up tells the
                        # operator mapping restarted at this pose)
                        "auto_resets": pipe.auto_resets,
                    }) + "\n"
                    # pub/sub: every connection gets the odometry line
                    self._broadcast(line.encode())
                if self.autosave and outs:
                    self._frames_since_save += len(outs)
                    if self._frames_since_save >= self.autosave_every:
                        self._snapshot()
            if kind == FLUSH:
                self._send_to(conn, b'{"flushed": true}\n')

    def _snapshot(self):
        """Periodic/shutdown checkpoint (call under _pipe_lock): pull
        the estimator's arrays to host NOW, hand compression + an
        atomic replace to the worker thread."""
        import os

        import jax

        from .io import checkpoint as ckpt_mod

        pipe = self.pipe
        if not pipe.map_built:
            return  # nothing worth snapshotting yet
        to_np = lambda t: jax.tree.map(np.asarray, t)
        state = to_np(pipe.state)
        m = to_np(pipe.checkpointable_map())
        vm_ = to_np(pipe.vio.vmap) if pipe.vio is not None else None
        calib = to_np(pipe.calib) if pipe.calib is not None else None
        self._frames_since_save = 0
        if self._saver is None:
            from concurrent.futures import ThreadPoolExecutor

            self._saver = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="fastlivo-autosave")

        path = str(self.autosave)
        if not path.endswith(".npz"):
            path += ".npz"

        def _write():
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                ckpt_mod.save(f, state, m, vm_, calib=calib)
            os.replace(tmp, path)  # a crash never leaves a torn file

        self._saver.submit(_write)


def main(argv=None):
    import argparse

    from .config import load_config

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None)
    ap.add_argument("--camera", default=None)
    ap.add_argument("--launch", default=None,
                    help="reference launch file; resolves --config/--camera")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--unix", default=None, help="unix socket path")
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--async-read", action="store_true",
                    help="deferred per-frame readback: the blocking "
                         "stats read overlaps the next frame's work; "
                         "odometry publishes one frame late")
    ap.add_argument("--block-read", type=int, default=0, metavar="E",
                    help="block-packed readback: pack E measurement "
                         "events' stats rows into one deferred device "
                         "read (full-LIVO pair 146 -> ~85 ms measured); "
                         "odometry publishes up to ~2E events late. "
                         "Incompatible with --log-dir.")
    ap.add_argument("--load-ckpt", default=None, metavar="PATH.npz",
                    help="warm-start from a checkpoint before serving "
                         "(state + maps + IMU calib; pair with "
                         "--autosave PATH to make a crashed server "
                         "resume where it left off on restart)")
    ap.add_argument("--autosave", default=None, metavar="PATH.npz",
                    help="periodic crash-recovery checkpoint (state + "
                         "maps + IMU calib; io/checkpoint format): "
                         "written every --autosave-every frames and at "
                         "shutdown, atomically replaced; resume with "
                         "run.py --load-ckpt / Pipeline.warm_start")
    ap.add_argument("--autosave-every", type=int, default=600,
                    metavar="N", help="frames between autosaves "
                    "(default 600 ~ 60 s at 10 Hz)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="run the fused frame steps SPMD over the first "
                         "N devices (jax.sharding.Mesh; 0 = single)")
    ap.add_argument("--sharded-map", action="store_true",
                    help="with --mesh N: block-shard the geometric map "
                         "(per-device map HBM ~1/N; per-scan halo "
                         "snapshot kNN — parallel/sharded_map.py)")
    args = ap.parse_args(argv)
    if args.launch:
        from .config import parse_launch

        cfg_yaml, cam_yaml = parse_launch(args.launch)
        args.config = args.config or str(cfg_yaml)
        if args.camera is None and cam_yaml is not None:
            args.camera = str(cam_yaml)
    if args.config is None:
        ap.error("--config (or --launch) is required")
    cfg = load_config(args.config, args.camera)
    if args.camera is None:
        cfg.img_enable = False
    addr = args.unix if args.unix else ("127.0.0.1", args.port)
    mesh = None
    if args.mesh:
        from .parallel.sharded import make_mesh

        mesh = make_mesh(args.mesh)
    elif args.sharded_map:
        ap.error("--sharded-map requires --mesh N")
    if args.block_read and args.log_dir:
        # enforce the documented incompatibility at ARGPARSE time
        # instead of an uncaught ValueError after the socket is bound
        ap.error("--block-read is incompatible with --log-dir "
                 "(per-frame trace logging needs per-frame reads)")
    if args.sharded_map and args.load_ckpt:
        ap.error("--sharded-map cannot restore a single-device map "
                 "checkpoint (rebuild from the stream)")
    srv = Server(cfg, addr, log_dir=args.log_dir, mesh=mesh,
                 sharded_map=args.sharded_map, autosave=args.autosave,
                 autosave_every=args.autosave_every)
    if args.load_ckpt:
        import os

        from .io import checkpoint as ckpt_mod

        if os.path.exists(args.load_ckpt) or os.path.exists(
                args.load_ckpt + ".npz"):
            srv.pipe.warm_start(*ckpt_mod.load(args.load_ckpt))
            print("warm-started from checkpoint", flush=True)
        else:
            # the crash-recovery pairing: on the FIRST boot the
            # autosave file does not exist yet — start cold, not fail
            print("checkpoint not found; starting cold", flush=True)
    if args.async_read:
        srv.pipe.async_read = True
    if args.block_read:
        srv.pipe.enable_block_read(args.block_read)
    print(f"listening on {srv.address}", flush=True)
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
