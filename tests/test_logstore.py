"""The log-store abstraction (storage/logstore.py) — round 9's
object-store deployability work (VERDICT r8, missing #1 / next #1).

Three layers of proof:

1. both implementations honor the LogStore contract (conditional
   create is exclusive, atomic put is last-writer-wins, torn objects
   read as absent on the emulator);
2. the WHOLE lake lifecycle (upsert, append, dedupe, delete, changes,
   time travel, vacuum) runs against the emulated object store with
   ``os.link`` and ``os.replace`` monkeypatched to RAISE — proving the
   commit protocol needs only conditional-put semantics, nothing
   POSIX-specific;
3. the two-host lost-update CAS race (the round-6 flagship test)
   stays closed across real processes on the emulated store.
"""

from __future__ import annotations

import datetime as dt
import os
import subprocess
import sys
import textwrap
import threading

import pytest

from sensapp_spark.storage.logstore import (
    ObjectStoreEmulator,
    PosixLogStore,
    S3LogStore,
    set_store,
)


class _ClientError(Exception):
    """botocore.ClientError look-alike: S3LogStore classifies errors
    by duck-typing the ``response`` attribute, so the stub needs no
    botocore installed."""

    def __init__(self, code: str, status: int):
        super().__init__(code)
        self.response = {
            "Error": {"Code": code},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }


class StubS3Client:
    """In-memory S3 with the exact call/error shapes the production
    client classifies: conditional PUT → 412 PreconditionFailed on an
    existing key, GET/HEAD → 404 on a missing one, ListObjectsV2 with
    delimiter grouping and (deliberately tiny) 2-keys-per-page
    pagination, idempotent DELETE. ``inject_conflicts`` makes the next
    N conditional PUTs fail with 409 ConflictingOperation — S3's
    'another conditional write is in flight' answer."""

    def __init__(self):
        self._lock = threading.Lock()
        self.objects: dict[str, bytes] = {}
        self.mtimes: dict[str, dt.datetime] = {}
        self.inject_conflicts = 0

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        with self._lock:
            if IfNoneMatch == "*" and self.inject_conflicts > 0:
                self.inject_conflicts -= 1
                raise _ClientError("ConflictingOperation", 409)
            if IfNoneMatch == "*" and Key in self.objects:
                raise _ClientError("PreconditionFailed", 412)
            self.objects[Key] = bytes(Body)
            self.mtimes[Key] = dt.datetime.now(dt.timezone.utc)
            return {}

    def get_object(self, Bucket, Key):
        import io

        with self._lock:
            if Key not in self.objects:
                raise _ClientError("NoSuchKey", 404)
            return {"Body": io.BytesIO(self.objects[Key])}

    def list_objects_v2(
        self, Bucket, Prefix="", Delimiter=None, ContinuationToken=None
    ):
        with self._lock:
            contents = []
            prefixes = set()
            for k in sorted(self.objects):
                if not k.startswith(Prefix):
                    continue
                rest = k[len(Prefix):]
                if Delimiter and Delimiter in rest:
                    prefixes.add(
                        Prefix + rest.split(Delimiter)[0] + Delimiter
                    )
                else:
                    contents.append({"Key": k})
            start = int(ContinuationToken or 0)
            page = contents[start:start + 2]
            trunc = start + 2 < len(contents)
            resp = {
                "Contents": page,
                "IsTruncated": trunc,
                "CommonPrefixes": [
                    {"Prefix": p} for p in sorted(prefixes)
                ],
            }
            if trunc:
                resp["NextContinuationToken"] = str(start + 2)
            return resp

    def delete_object(self, Bucket, Key):
        with self._lock:
            self.objects.pop(Key, None)
            return {}

    def head_object(self, Bucket, Key):
        with self._lock:
            if Key not in self.objects:
                raise _ClientError("404", 404)
            return {
                "ContentLength": len(self.objects[Key]),
                "LastModified": self.mtimes.get(Key),
            }


def _s3_stub_store() -> S3LogStore:
    return S3LogStore("test-bucket", prefix="lakes", client=StubS3Client())


STORES = [PosixLogStore, ObjectStoreEmulator, _s3_stub_store]


@pytest.fixture(params=STORES, ids=["posix", "emulated", "s3stub"])
def store(request):
    return request.param()


def test_put_if_absent_is_exclusive(store, tmp_path):
    p = str(tmp_path / "log" / "00000001")
    assert store.put_if_absent(p, b"v1") is True
    assert store.put_if_absent(p, b"v2") is False
    assert store.read(p) == b"v1"


def test_put_is_last_writer_wins(store, tmp_path):
    p = str(tmp_path / "ptr")
    store.put(p, b"a")
    store.put(p, b"bb")
    assert store.read(p) == b"bb"


def test_read_absent_is_none_and_delete_idempotent(store, tmp_path):
    p = str(tmp_path / "nope")
    assert store.read(p) is None
    store.delete(p)  # no error
    store.put(p, b"x")
    store.delete(p)
    assert store.read(p) is None


def test_list_names_sorted(store, tmp_path):
    d = str(tmp_path / "log")
    for n in ("00000002", "00000001"):
        store.put_if_absent(os.path.join(d, n), n.encode())
    assert store.list(d) == ["00000001", "00000002"]
    assert store.list(str(tmp_path / "missing")) == []


def test_concurrent_claims_have_one_winner(store, tmp_path):
    """16 threads race one conditional create: exactly one wins, and
    the surviving content is the winner's."""
    p = str(tmp_path / "log" / "00000001")
    results = []

    def claim(i):
        results.append((i, store.put_if_absent(p, b"w%d" % i)))

    threads = [
        threading.Thread(target=claim, args=(i,)) for i in range(16)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    winners = [i for i, won in results if won]
    assert len(winners) == 1
    assert store.read(p) == b"w%d" % winners[0]


def test_emulator_torn_object_reads_absent_and_is_reclaimable(tmp_path):
    """A crashed writer's half-written object (bad frame / digest)
    reads as ABSENT — like an S3 PUT that never completed — and the
    next conditional create takes the claim over."""
    store = ObjectStoreEmulator()
    p = str(tmp_path / "log" / "00000001")
    os.makedirs(os.path.dirname(p))
    with open(p, "wb") as f:
        f.write(b"OSEM1\n" + (99).to_bytes(8, "big") + b"garbage")
    assert store.read(p) is None
    assert store.put_if_absent(p, b"taken-over") is True
    assert store.read(p) == b"taken-over"


def test_emulator_rejects_digest_mismatch(tmp_path):
    import hashlib

    store = ObjectStoreEmulator()
    p = str(tmp_path / "obj")
    store.put(p, b"good")
    raw = open(p, "rb").read()
    # Flip one content byte, keep the frame lengths intact.
    with open(p, "wb") as f:
        f.write(raw[:-1] + bytes([raw[-1] ^ 1]))
    assert store.read(p) is None
    del hashlib  # (imported for readers of the frame layout)


# ---------------------------------------------------------------------------
# The lake on the emulated object store, with POSIX primitives FORBIDDEN
# ---------------------------------------------------------------------------


VALUES_DDL = "sensor_id string, time timestamp, value double"
SENSOR_DDL = (
    "sensor_id string, name string, type string, unit string, "
    "unit_description string, labels map<string,string>"
)


def _forbid(name):
    def boom(*a, **kw):
        raise AssertionError(
            f"os.{name} called — the lake's metadata protocol must not "
            "use POSIX rename/link primitives on an object store"
        )

    return boom


@pytest.fixture(params=[ObjectStoreEmulator, _s3_stub_store],
                ids=["emulated", "s3stub"])
def object_store_lake(request, spark, tmp_path, monkeypatch):
    from sensapp_spark.storage.lake import SensorLake

    prev = set_store(request.param())
    # Forbid the POSIX primitives for the duration: every Python-side
    # metadata write must go through the emulator. (Spark's JVM-side
    # parquet committer is the data plane — out of scope, object-store
    # ready via the s3a committers.)
    monkeypatch.setattr(os, "link", _forbid("link"))
    monkeypatch.setattr(os, "replace", _forbid("replace"))
    try:
        yield SensorLake(spark, str(tmp_path / "lake"))
    finally:
        set_store(prev)


def test_lake_lifecycle_on_emulated_object_store(object_store_lake, spark):
    """End-to-end lake operations with link/replace forbidden: the
    round-8 verdict's 'Done' gate for the object-store work."""
    from sensapp_spark.datamodel.types import SensorType

    lake = object_store_lake
    t0 = dt.datetime(2024, 1, 1)

    # Dimension CAS upserts (two merges → conditional commits).
    for ids in (["a", "b"], ["b", "c"]):
        lake.upsert_sensors(
            spark.createDataFrame(
                [(i, f"n-{i}", "Float", None, None, {}) for i in ids],
                SENSOR_DDL,
            )
        )
    assert {r.sensor_id for r in lake.sensors().collect()} == {
        "a", "b", "c"
    }

    # Value appends + zone-map sidecar refresh (atomic puts).
    lake.append_values(
        SensorType.FLOAT,
        spark.createDataFrame(
            [("a", t0, 1.0), ("b", t0, 2.0), ("b", t0, 2.0)], VALUES_DDL
        ),
    )
    assert lake.values(SensorType.FLOAT).count() == 3

    # Maintenance rewrite (manifest write) + tombstoned delete.
    lake.dedup_rewrite(SensorType.FLOAT, quiesce_wait_s=0.2)
    assert lake.values(SensorType.FLOAT).count() == 2
    lake.delete_where(
        SensorType.FLOAT, "sensor_id = 'a'", quiesce_wait_s=0.2
    )
    got = {r.sensor_id for r in lake.values(SensorType.FLOAT).collect()}
    assert got == {"b"}

    # Changes feed + history + vacuum still function.
    df, cursor = lake.changes(SensorType.FLOAT)
    assert df.count() == 1 and cursor["seq"] >= 1
    assert len(lake.history(SensorType.FLOAT)) >= 2
    lake.vacuum_orphans(min_age_s=3600.0)


def test_conditional_commit_conflict_on_emulated_store(
    object_store_lake, spark, tmp_path
):
    """A stale expected_seq still raises CommitConflict through the
    emulator (the CAS semantics survive the backend swap)."""
    from sensapp_spark.storage.lake import (
        CommitConflict,
        atomic_overwrite,
        read_committed,
    )

    path = str(tmp_path / "lake" / "tbl")
    df = spark.range(3)
    atomic_overwrite(df, path)
    seq, _ = read_committed(path)
    atomic_overwrite(df, path, expected_seq=seq)
    with pytest.raises(CommitConflict):
        atomic_overwrite(df, path, expected_seq=seq)  # stale base


CAS_WORKER_EMULATED = textwrap.dedent(
    """
    import os
    import sys
    import time

    repo, lake_root, tag, barrier = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
    )
    sys.path.insert(0, repo)
    os.environ["SENSAPP_LOG_STORE"] = "emulated"

    # Forbid the POSIX metadata primitives BEFORE any lake import:
    # every commit-protocol write in this worker must go through the
    # emulated object store's conditional/atomic PUTs.
    _real_link, _real_replace = os.link, os.replace
    def _no_link(*a, **kw):
        raise OSError("link(2) forbidden: object-store mode")
    def _no_replace(*a, **kw):
        raise OSError("rename forbidden: object-store mode")
    os.link, os.replace = _no_link, _no_replace

    from sensapp_spark.session import get_spark
    from sensapp_spark.storage.lake import SensorLake

    spark = get_spark(app_name=f"osem-worker-{tag}", master="local[2]",
                      shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    lake = SensorLake(spark, lake_root)
    ddl = ("sensor_id string, name string, type string, unit string, "
           "unit_description string, labels map<string,string>")
    attempts = {"n": 0}

    def pause():
        attempts["n"] += 1
        if attempts["n"] > 1:
            return
        open(os.path.join(barrier, f"pinned_{tag}"), "w").close()
        deadline = time.time() + 120
        while time.time() < deadline:
            pinned = [f for f in os.listdir(barrier)
                      if f.startswith("pinned_")]
            if len(pinned) >= 2:
                return
            time.sleep(0.02)
        raise RuntimeError("barrier timeout: peer never pinned its base")

    lake.upsert_sensors(
        spark.createDataFrame(
            [(f"s-{tag}", f"name-{tag}", "Float", None, None, {})], ddl
        ),
        _pause_before_commit=pause,
    )
    print(f"ATTEMPTS {attempts['n']}")
    spark.stop()
    """
)


def test_two_hosts_lost_update_closed_on_emulated_store(spark, tmp_path):
    """The round-6 flagship race, re-run on the emulated object store
    with link/replace raising in both workers: two real processes pin
    the same base, both commit, exactly one conditional PUT wins, the
    loser re-merges — no lost sensor. This is the 'Done' criterion of
    VERDICT r8 next-#1."""
    from sensapp_spark.storage.lake import SensorLake

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lake_root = str(tmp_path / "lake")
    barrier = tmp_path / "barrier"
    barrier.mkdir()
    script = tmp_path / "osem_worker.py"
    script.write_text(CAS_WORKER_EMULATED)

    procs = []
    for tag in ("h1", "h2"):
        cwd = tmp_path / f"cwd_{tag}"
        cwd.mkdir()
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), repo, lake_root, tag,
                 str(barrier)],
                cwd=str(cwd),
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    attempts = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
        for line in out.decode().splitlines():
            if line.startswith("ATTEMPTS"):
                attempts.append(int(line.split()[1]))

    assert sorted(attempts) == [1, 2], (
        f"expected exactly one CAS retry, got attempts={attempts}"
    )
    # Read the result back with the same emulated store (entry objects
    # are framed, so the POSIX store cannot parse them).
    prev = set_store(ObjectStoreEmulator())
    try:
        lake = SensorLake(spark, lake_root)
        got = {r.sensor_id for r in lake.sensors().collect()}
    finally:
        set_store(prev)
    assert got == {"s-h1", "s-h2"}, f"lost update: {got}"


# ---------------------------------------------------------------------------
# The ANN store on the emulated object store
# ---------------------------------------------------------------------------


def test_ann_store_lifecycle_on_emulated_object_store(
    spark, tmp_path, monkeypatch
):
    """The ANN layouts commit through the same conditional-put log as
    the lake, so the whole write → probe → append → drift lifecycle
    must run with the POSIX metadata primitives out of reach. os.link
    raises OSError (an object store has no hardlinks) rather than
    AssertionError: _clone_tree's documented fallback is a real copy —
    data plane, like Spark's parquet writes — while os.replace stays
    FORBIDDEN (any Python-side metadata rename would be a protocol
    leak)."""
    from sensapp_spark.storage.ann import AnnIndexStore

    prev = set_store(ObjectStoreEmulator())
    monkeypatch.setattr(
        os, "link", lambda *a, **kw: (_ for _ in ()).throw(
            OSError("object stores have no hardlinks")
        )
    )
    monkeypatch.setattr(os, "replace", _forbid("replace"))
    try:
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        base = emb.filter("vec_id < 350")
        batch = emb.filter("vec_id >= 350")
        s = AnnIndexStore(spark, str(tmp_path / "ann"))
        s.write_ivfsq(base, name="sq_obj")
        q = [float(x) for x in emb.orderBy("vec_id").first().embedding]
        assert s.ivfsq_topk(q, k=5, name="sq_obj").count() == 5
        meta = s.append("sq_obj", batch)
        assert meta["n_vectors"] == emb.count()
        rows = s.ivfsq_topk(
            q, k=5, name="sq_obj", rerank_against=emb, rerank=25
        ).collect()
        assert len(rows) == 5 and rows[0].score == 1.0
        report = s.drift("sq_obj")
        assert report["kind"] == "ivfsq"
        assert s.vacuum("sq_obj", min_age_s=0.0) == []
    finally:
        set_store(prev)


# ---------------------------------------------------------------------------
# S3LogStore specifics (beyond the shared contract suite above)
# ---------------------------------------------------------------------------


def test_s3_conflict_409_retries_until_win(tmp_path):
    """ConflictingOperation (another conditional PUT in flight) is not
    a loss: the claim re-probes and, with the key still absent, retries
    the PUT — AWS's own guidance for 409 on conditional writes."""
    s = _s3_stub_store()
    s.client.inject_conflicts = 3
    p = str(tmp_path / "log" / "00000001")
    assert s.put_if_absent(p, b"v1") is True
    assert s.read(p) == b"v1"


def test_s3_conflict_409_then_loser_detects_winner(tmp_path):
    """If the in-flight competitor LANDS during the 409 window, the
    re-probe sees the durable object and the claim returns False."""
    s = _s3_stub_store()
    p = str(tmp_path / "log" / "00000001")

    real_exists = s.exists

    def exists_with_competitor_landing(path):
        # The competitor's PUT completes while we were backing off.
        s.client.objects[s._key(p)] = b"winner"
        return real_exists(path)

    s.client.inject_conflicts = 1
    s.exists = exists_with_competitor_landing
    assert s.put_if_absent(p, b"loser") is False
    assert s.read(p) == b"winner"


def test_s3_conflict_retries_exhausted_raises(tmp_path):
    s = _s3_stub_store()
    s.client.inject_conflicts = 10**9
    s.conflict_retries = 3
    with pytest.raises(TimeoutError, match="conflicting"):
        s.put_if_absent(str(tmp_path / "x"), b"v")


def test_s3_list_paginates_and_excludes_nested(tmp_path):
    """ListObjectsV2 pagination (stub pages at 2 keys) and delimiter
    grouping: nested 'directories' never leak into a listing."""
    s = _s3_stub_store()
    d = str(tmp_path / "log")
    for n in ("5", "1", "3", "2", "4"):
        s.put(os.path.join(d, f"0000000{n}"), n.encode())
    s.put(os.path.join(d, "nested", "deep"), b"x")
    assert s.list(d) == [f"0000000{n}" for n in "12345"]
    assert s.list(str(tmp_path / "missing")) == []


def test_s3_keys_carry_prefix(tmp_path):
    s = _s3_stub_store()
    p = str(tmp_path / "lake" / "_commits" / "00000001")
    s.put(p, b"v")
    (key,) = s.client.objects.keys()
    assert key == "lakes" + p
    assert key.startswith("lakes/") and not key.startswith("lakes//")


def test_s3_exists_and_delete(tmp_path):
    s = _s3_stub_store()
    p = str(tmp_path / "obj")
    assert s.exists(p) is False
    s.put(p, b"v")
    assert s.exists(p) is True
    s.delete(p)
    s.delete(p)  # idempotent
    assert s.exists(p) is False and s.read(p) is None


def test_env_selection_parses_s3_url(monkeypatch):
    """SENSAPP_LOG_STORE=s3://bucket/prefix picks the production
    client. boto3 is absent in this container, so constructing the
    default client must raise the documented ImportError — proving the
    guard, not silently falling back."""
    import sensapp_spark.storage.logstore as ls

    prev = ls.set_store(None)
    monkeypatch.setenv("SENSAPP_LOG_STORE", "s3://bkt/pre")
    try:
        try:
            store = ls.get_store()
        except ImportError as e:
            assert "boto3" in str(e)
        else:  # boto3 present in some environments: check the wiring
            assert isinstance(store, ls.S3LogStore)
            assert (store.bucket, store.prefix) == ("bkt", "pre")
    finally:
        ls.set_store(prev)


def test_s3_lost_response_retry_is_not_a_lost_claim(tmp_path):
    """Round-10 review finding 2: our conditional PUT succeeds but the
    200 is lost; the SDK re-sends and gets 412 from OUR OWN object.
    The read-back comparison recognizes the claim as WON — a False
    here would make the winner re-commit its batch at the next seq
    (duplicate rows). A genuinely foreign object still loses."""
    s = _s3_stub_store()
    p = str(tmp_path / "log" / "00000001")

    real_put = s.client.put_object

    def put_lost_response(Bucket, Key, Body, IfNoneMatch=None):
        real_put(Bucket=Bucket, Key=Key, Body=Body,
                 IfNoneMatch=IfNoneMatch)
        # The write landed server-side; the response did not make it
        # back, and the SDK's internal retry then observed 412.
        raise _ClientError("PreconditionFailed", 412)

    s.client.put_object = put_lost_response
    assert s.put_if_absent(p, b"v_00000001_deadbeef") is True
    s.client.put_object = real_put
    # A different writer's claim (different content) still loses.
    assert s.put_if_absent(p, b"v_00000001_cafebabe") is False
    assert s.read(p) == b"v_00000001_deadbeef"
