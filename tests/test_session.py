"""Session-factory tests: the production storage-config surface (the
reference connector's mount-time endpoint + credential resolution,
CephRgwFileSystem.java:98-147, re-expressed as Hadoop s3a options) and
the split-sizing lever (virtual block size, CephRgwFileSystem.java:112 →
spark.sql.files.maxPartitionBytes)."""

from hadoop_fs_ceph_spark.session import get_spark, s3a_storage_conf


def test_s3a_storage_conf_shapes():
    conf = s3a_storage_conf(
        "http://rgw.example:7480",
        access_key="AK",
        secret_key="SK",
        path_style_access=True,
        ssl_enabled=False,
    )
    assert conf["fs.s3a.endpoint"] == "http://rgw.example:7480"
    assert conf["fs.s3a.access.key"] == "AK"
    assert conf["fs.s3a.secret.key"] == "SK"
    assert conf["fs.s3a.path.style.access"] == "true"
    assert conf["fs.s3a.connection.ssl.enabled"] == "false"

    # per-bucket scoping = the reference's one-filesystem-per-bucket mount
    scoped = s3a_storage_conf("http://rgw:7480", bucket="lake")
    assert scoped["fs.s3a.bucket.lake.endpoint"] == "http://rgw:7480"
    # credentials omitted -> provider-chain fallback (no key entries)
    assert not any(k.endswith((".access.key", ".secret.key")) for k in scoped)


def test_storage_conf_lands_on_session(spark):
    # getOrCreate returns the SHARED session: snapshot and restore every
    # touched fs.s3a.* key so the fake endpoint/credentials don't leak
    # into the rest of the pytest session.
    conf = s3a_storage_conf(
        "http://rgw.test:7480", access_key="AKTEST", secret_key="SKTEST"
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    saved = {k: hconf.get(k) for k in conf}
    try:
        s = get_spark("storage-conf-test", storage_conf=conf)
        hc = s.sparkContext._jsc.hadoopConfiguration()
        assert hc.get("fs.s3a.endpoint") == "http://rgw.test:7480"
        assert hc.get("fs.s3a.access.key") == "AKTEST"
        assert hc.get("fs.s3a.path.style.access") == "true"
    finally:
        for k, v in saved.items():
            if v is None:
                hconf.unset(k)
            else:
                hconf.set(k, v)


def test_max_partition_bytes_applied(spark):
    # the session fixture already exists; maxPartitionBytes is a runtime
    # SQL conf, so a fresh get_spark call re-applies it via the builder
    # only on new sessions — assert the default landed on this one.
    assert spark.conf.get("spark.sql.files.maxPartitionBytes").rstrip("b") in (
        str(128 * 1024 * 1024),
        "134217728",
    )
