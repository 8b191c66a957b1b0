"""Pins the streaming state-store provider policy (VERDICT r8 #6):
RocksDB is the DEFAULT on any non-local master (cluster state sizes are
unbounded; the HDFS-backed store materializes every key on-heap per
version), the heap-backed default stays on local masters (RocksDB costs
~0.7 s native-store overhead at test-SF state sizes), and an explicit
SPARK_GRAFT_STATE_STORE request wins in both directions."""

from semantic_query_engine_spark.session import (
    _ROCKSDB_PROVIDER,
    state_store_provider,
)


def test_local_master_defaults_to_heap_store():
    assert state_store_provider("local[32]") is None
    assert state_store_provider("local[*]") is None
    # local-cluster is still a single-machine test harness
    assert state_store_provider("local-cluster[2,16,4096]") is None


def test_cluster_master_defaults_to_rocksdb():
    for master in ("yarn", "spark://host:7077", "k8s://https://host:443"):
        assert state_store_provider(master) == _ROCKSDB_PROVIDER


def test_explicit_request_wins_both_ways():
    assert state_store_provider("local[32]", "rocksdb") == _ROCKSDB_PROVIDER
    assert state_store_provider("yarn", "hdfs") is None
    assert state_store_provider("yarn", "default") is None
    assert state_store_provider("yarn", "ROCKSDB") == _ROCKSDB_PROVIDER
