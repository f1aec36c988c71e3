"""SparkSession helper tuned for this engine.

Scale notes (100 TB design): these settings are the local-mode analog of
what a 1000-executor deployment would set cluster-wide — AQE on (runtime
shuffle-partition coalescing + skew-join splitting), modest
shuffle-partition default for local runs, Arrow enabled so any Pandas-UDF
path is batched, and timestamps kept NTZ so parquet round-trips are
timezone-stable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_PY4J_NODELAY_DONE = False


def _enable_py4j_nodelay() -> None:
    """Set TCP_NODELAY on every py4j control-channel socket.

    py4j never sets it, and on kernels/virtualized network stacks where
    loopback small-packet delivery is not free (measured here: ~6 ms per
    Nagle-delayed segment, 39 ms per py4j round trip) every DataFrame
    API call pays the Nagle/delayed-ACK stall. With NODELAY the same
    round trip measures ~4.8 ms — an 8x cut to ALL driver-side plan
    construction (guide §1: the bench's plan_build_sec is pure py4j
    traffic). On a normal kernel loopback this is a no-op (segments
    already flush immediately); it never changes semantics, only
    flushing, so it is safe everywhere.
    """
    global _PY4J_NODELAY_DONE
    if _PY4J_NODELAY_DONE:
        return
    _PY4J_NODELAY_DONE = True
    import socket as _socket

    def _nodelay(sock) -> None:
        try:
            sock.setsockopt(_socket.IPPROTO_TCP, _socket.TCP_NODELAY, 1)
        except Exception:
            pass  # non-TCP (SSL-wrapped, UDS) or already-closed socket

    try:
        import py4j.clientserver as _cs

        _orig_cs_connect = _cs.ClientServerConnection.connect_to_java_server

        def _cs_connect(self):
            _orig_cs_connect(self)
            _nodelay(self.socket)

        _cs.ClientServerConnection.connect_to_java_server = _cs_connect

        # Java -> Python callback connections are accepted sockets on the
        # Python-side server; patch them at init so both directions flush.
        _orig_cs_init = _cs.ClientServerConnection.init_socket_from_python_server

        def _cs_init(self, socket, stream):
            _orig_cs_init(self, socket, stream)
            _nodelay(socket)

        _cs.ClientServerConnection.init_socket_from_python_server = _cs_init
    except Exception:
        pass
    try:
        import py4j.java_gateway as _jg

        _orig_gw_start = _jg.GatewayConnection.start

        def _gw_start(self):
            _orig_gw_start(self)
            _nodelay(self.socket)

        _jg.GatewayConnection.start = _gw_start
    except Exception:
        pass


def _fast_scratch_dir(sub: str) -> str | None:
    """A tmpfs-backed scratch dir when the host has one, else None.

    Shuffle files and Python-channel unix sockets live in
    ``spark.local.dir`` / the UDS dir; on this sandbox the default
    /tmp sits on a virtio disk whose open/mmap syscalls dominate
    small-job latency (thread dumps showed executor tasks pinned in
    FileOutputStream.open0/FileChannelImpl.map0 — guide §7.3). tmpfs
    removes that. Production clusters point spark.local.dir at fast
    local disks for the same reason; honor an explicit override first.
    """
    if os.environ.get("SPARK_LOCAL_DIRS"):
        return None  # standard env override wins
    if os.environ.get("PG_DUCKLAKE_TMPFS_SCRATCH", "auto").lower() in ("off", "0", "false"):
        return None  # explicit opt-out (ADVICE r12)
    base = "/dev/shm"
    if not (os.path.isdir(base) and os.access(base, os.W_OK)):
        return None
    # tmpfs is RAM-backed: require real headroom so big shuffles/spills
    # don't fill it and OOM-pressure the host (ADVICE r12). Production
    # deployments should set SPARK_LOCAL_DIRS to fast local disks.
    try:
        st = os.statvfs(base)
        if st.f_bavail * st.f_frsize < 8 * 1024**3:
            return None
    except OSError:
        return None
    # per-user path: a second user on a shared host must not collide
    # with (and be locked out by) the first user's directory.
    uid = os.getuid() if hasattr(os, "getuid") else 0
    path = os.path.join(base, f"{sub}_{uid}")
    try:
        os.makedirs(path, exist_ok=True)
        if not os.access(path, os.W_OK):
            return None
    except OSError:
        return None
    return path


def get_spark(app_name: str = "pg_ducklake_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a local SparkSession with sane analytic defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    # Python workers (Pandas UDFs, Python data sources) must be able to
    # import this package; propagate the repo root before the JVM forks.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )
    _enable_py4j_nodelay()
    from pg_ducklake_spark import rpcslim

    rpcslim.install()
    shuffle = max(4, min(64, cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Disable Python-side call-site capture (upstream conf,
        # SPARK-44100 family): with it on, EVERY DataFrame/Column API
        # call does ~8 extra py4j RPCs (resolve PySparkCurrentOrigin,
        # conf.get the stack depth, set + clear) purely to enrich error
        # messages with the user line number. Measured here: F.col went
        # 13 -> 3 RPCs, whole query builds roughly halved their RPC
        # count. Diagnostic metadata only — plans and results are
        # identical (see rpcslim.py for the companion client patches).
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Python data plane over unix domain sockets (Spark 4.1,
        # spark.python.unix.domain.socket.enabled): collect /
        # createDataFrame / accumulator / Python-worker channels skip
        # the TCP loopback stack entirely — on this sandbox a loopback
        # TCP segment costs ~0.5-6 ms (userspace-proxied), so every
        # collect() paid a multi-segment handshake tax. UDS also
        # removes the per-connection auth-secret round trip cost from
        # the hot path. Semantics unchanged (upstream-supported conf).
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Local-mode split sizing: the sf0.1 tables are single ~20 MB
        # parquet files, which the 128 MB default reads as ONE partition —
        # zero scan parallelism. 4 MB splits spread the scan across cores.
        # (On a real cluster with properly sized files, keep the default.)
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # TIME columns (types.sql native tier) need the 4.x feature flag
        .config("spark.sql.timeType.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    local_dir = _fast_scratch_dir("pg_ducklake_spark_local")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    uds_dir = _fast_scratch_dir("pg_ducklake_spark_uds")
    if uds_dir:
        builder = builder.config("spark.python.unix.domain.socket.dir", uds_dir)
    return builder.getOrCreate()
