"""Cluster-metadata seed tables (SURVEY S6/S7): access zones, network
pools with IP ranges, nodes with revisions, and settings documents.

The reference fetches these rows from the OneFS REST API — zones
(``onefs.py:701-703,1398-1401``), network pools with ranges
(``onefs.py:659-665,1182-1197``), node revisions
(``onefs.py:684-686,1240-1249``), ACL/HDFS/zone settings projections
(``onefs.py:705-726,1122-1142,1376-1396``). The engine declares
equivalent fact rows and exposes them as broadcast-sized DataFrames;
in production the same shapes arrive via ``spark.read`` from the
cluster's export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from isilon_hadoop_tools_spark.sources.local import local_df

# (zone_name, zone_path, zone_id) — mixed case on purpose: the
# reference compares zone names case-insensitively (onefs.py:688-693)
ZONE_ROWS: tuple[tuple[str, str, int], ...] = (
    ("System", "/ifs", 1),
    ("Zone1", "/ifs/zone1", 2),
    ("HDP-Zone", "/ifs/hdp", 3),
)

# (pool_name, low_ip, high_ip) — pool_name carries a "subnet:pool"
# shape the reference splits (onefs.py:1082,1277 split-":" idiom)
POOL_ROWS: tuple[tuple[str, str, str], ...] = (
    ("subnet0:pool0", "10.7.180.1", "10.7.180.6"),
    ("subnet0:pool1", "10.7.180.4", "10.7.180.9"),
    ("subnet1:pool2", "192.168.1.250", "192.168.2.3"),
)

# (node_id, revision) — all equal: the cluster is not mid-upgrade
# (revision() cardinality-1 assert, onefs.py:1240-1245)
NODE_ROWS: tuple[tuple[int, str], ...] = (
    (1, "0x900050500000000B"),
    (2, "0x900050500000000B"),
    (3, "0x900050500000000B"),
)

# single-row HDFS settings document per zone (onefs.py:1122-1142)
HDFS_SETTINGS_ROWS: tuple[tuple[str, str, int, bool], ...] = (
    ("Zone1", "hadoop", 131072, True),
    ("HDP-Zone", "apps/hdfs", 65536, True),
)

# (realm_name, auth_provider, sc_zone) — kerberos realms + their
# SmartConnect zone name (realms() onefs.py:1235-1238; provider
# create onefs.py:851-860; SPN names built as "{service}/{sc_zone}",
# onefs.py:919-932)
REALM_ROWS: tuple[tuple[str, str, str], ...] = (
    ("EXAMPLE.COM", "krb5-example", "cluster.example.com"),
    ("CORP.LOCAL", "krb5-corp", "corp-cluster.corp.local"),
)

# (realm_name, spn) — current keytab entries (_keytab_entries
# onefs.py:648-653); one stale host on purpose so the reconcile has a
# delete row (delete_spn keep-list semantics, onefs.py:988-1000)
KEYTAB_ROWS: tuple[tuple[str, str], ...] = (
    ("EXAMPLE.COM", "hdfs/cluster.example.com"),
    ("EXAMPLE.COM", "HTTP/cluster.example.com"),
    ("EXAMPLE.COM", "hdfs/old-node.example.com"),
    ("CORP.LOCAL", "HTTP/corp-cluster.corp.local"),
)

ZONES_SCHEMA = "zone_name STRING, zone_path STRING, zone_id INT"
POOLS_SCHEMA = "pool_name STRING, low_ip STRING, high_ip STRING"
NODES_SCHEMA = "node_id INT, revision STRING"
HDFS_SETTINGS_SCHEMA = (
    "zone_name STRING, root_directory STRING, default_block_size INT, "
    "service_enabled BOOLEAN"
)
REALMS_SCHEMA = "realm_name STRING, auth_provider STRING, sc_zone STRING"
KEYTAB_SCHEMA = "realm_name STRING, spn STRING"


def zones_df(spark: SparkSession) -> DataFrame:
    return local_df(spark, list(ZONE_ROWS), ZONES_SCHEMA)


def pools_df(spark: SparkSession) -> DataFrame:
    return local_df(spark, list(POOL_ROWS), POOLS_SCHEMA)


def nodes_df(spark: SparkSession) -> DataFrame:
    return local_df(spark, list(NODE_ROWS), NODES_SCHEMA)


def hdfs_settings_df(spark: SparkSession) -> DataFrame:
    return local_df(spark, list(HDFS_SETTINGS_ROWS), HDFS_SETTINGS_SCHEMA)


def realms_df(spark: SparkSession) -> DataFrame:
    return local_df(spark, list(REALM_ROWS), REALMS_SCHEMA)


def keytab_df(spark: SparkSession) -> DataFrame:
    return local_df(spark, list(KEYTAB_ROWS), KEYTAB_SCHEMA)


# Licenses (reference ``check_license`` ``onefs.py:796-806``,
# ``_license_is_active`` ``onefs.py:606-607``): a license is active
# when its status is one of {activated, evaluation, licensed}
# (case-insensitive); an inactive license with a past expiration is
# EXPIRED (ExpiredLicenseError), otherwise MISSING
# (MissingLicenseError).
LICENSES_SCHEMA = "name STRING, status STRING, expiration STRING"
LICENSE_ROWS: tuple[tuple[str, str, str | None], ...] = (
    ("SmartConnect Advanced", "Activated", None),
    ("HDFS", "Evaluation", "2030-06-30"),
    ("CloudPools", "Expired", "2020-01-31"),
    ("SyncIQ", "Unlicensed", None),
)

_ACTIVE_STATUSES = ("activated", "evaluation", "licensed")


def licenses_df(spark: SparkSession) -> DataFrame:
    return local_df(spark, list(LICENSE_ROWS), LICENSES_SCHEMA)


def license_status(df: DataFrame, as_of: str) -> DataFrame:
    """Classify every license row as ``active`` / ``expired`` /
    ``missing`` with the reference's exact branch order
    (``onefs.py:796-806``): active by status; else expired only when
    an expiration date exists and is before ``as_of`` (the reference
    compares to ``date.today()`` — passed explicitly here so the
    classification is a pure, testable function); else missing."""
    active = F.lower(F.col("status")).isin(*_ACTIVE_STATUSES)
    expired = F.col("expiration").isNotNull() & (
        F.to_date("expiration") < F.to_date(F.lit(as_of))
    )
    return df.select(
        "name",
        F.when(active, "active")
        .when(expired, "expired")
        .otherwise("missing")
        .alias("license_state"),
    )
