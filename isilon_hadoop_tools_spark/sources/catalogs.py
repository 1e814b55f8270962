"""Static seed catalogs (SURVEY S1/S2), normalized to 1NF DataFrames.

The reference builds nested in-memory documents — ``cdh_identities``
(``identities.py:350-396``), ``cdp_identities`` (``:399-472``),
``hdp_identities`` (``:475-538``) and ordered ``HDFSDirectory`` lists
(``directories.py:115-240``). The engine declares the same *facts* as
flat row tuples and exposes them as four normalized DataFrames
(users / groups / memberships / proxy_users) plus a directories
DataFrame with an explicit ``seq`` column preserving parent-first
order (``directories.py:117-140`` list order is significant).

At scale these are broadcast-sized dimension tables: single-partition
DataFrames that Catalyst will broadcast into any join against them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from isilon_hadoop_tools_spark.sources.local import local_df

DISTS = ("cdh", "cdp", "hdp")

# (user_name, primary_group, secondary_groups) — identities.py:353-393
_CDH_USERS = (
    ("accumulo", "accumulo", ()),
    ("anonymous", "anonymous", ()),
    ("apache", "apache", ()),
    ("cloudera-scm", "cloudera-scm", ()),
    ("cmjobuser", "cmjobuser", ()),
    ("flume", "flume", ()),
    ("hbase", "hbase", ("hadoop", "supergroup")),
    ("hdfs", "hdfs", ("hadoop", "supergroup")),
    ("hive", "hive", ()),
    ("HTTP", "HTTP", ("hadoop", "supergroup")),
    ("httpfs", "httpfs", ()),
    ("hue", "hue", ()),
    ("impala", "impala", ("hive",)),
    ("kafka", "kafka", ()),
    ("keytrustee", "keytrustee", ()),
    ("kms", "kms", ()),
    ("kudu", "kudu", ()),
    ("llama", "llama", ()),
    ("mapred", "mapred", ("hadoop", "supergroup")),
    ("oozie", "oozie", ()),
    ("sentry", "sentry", ()),
    ("solr", "solr", ()),
    ("spark", "spark", ()),
    ("sqoop", "sqoop", ("sqoop2",)),
    ("sqoop2", "sqoop2", ("sqoop",)),
    ("yarn", "yarn", ("hadoop", "supergroup")),
    ("zookeeper", "zookeeper", ()),
)

# identities.py:402-469
_CDP_USERS = (
    ("accumulo", "accumulo", ()),
    ("anonymous", "anonymous", ()),
    ("apache", "apache", ()),
    ("atlas", "atlas", ("hadoop", "supergroup")),
    ("cloudera-scm", "cloudera-scm", ()),
    ("cmjobuser", "cmjobuser", ()),
    ("cruisecontrol", "cruisecontrol", ()),
    ("druid", "druid", ("hadoop", "supergroup")),
    ("flume", "flume", ()),
    ("hbase", "hbase", ("hadoop", "supergroup")),
    ("hdfs", "hdfs", ("hadoop", "supergroup")),
    ("hive", "hive", ()),
    ("HTTP", "HTTP", ("hadoop", "supergroup")),
    ("httpfs", "httpfs", ()),
    ("hue", "hue", ()),
    ("impala", "impala", ("hive",)),
    ("kafka", "kafka", ()),
    ("keyadmin", "keyadmin", ()),
    ("keytrustee", "keytrustee", ()),
    ("kms", "kms", ()),
    ("knox", "knox", ()),
    ("knoxui", "knoxui", ()),
    ("kudu", "kudu", ()),
    ("llama", "llama", ()),
    ("livy", "livy", ()),
    ("mapred", "mapred", ("hadoop", "supergroup")),
    ("nifi", "nifi", ()),
    ("nifiregistry", "nifiregistry", ()),
    ("oozie", "oozie", ()),
    ("phoenix", "phoenix", ()),
    ("ranger", "ranger", ("hadoop", "supergroup")),
    ("rangeradmin", "rangeradmin", ()),
    ("rangerlookup", "rangerlookup", ()),
    ("rangerraz", "rangerraz", ()),
    ("rangerrms", "rangerrms", ()),
    ("rangertagsync", "rangertagsync", ()),
    ("rangerusersync", "rangerusersync", ()),
    ("schemaregistry", "schemaregistry", ()),
    ("sentry", "sentry", ()),
    ("solr", "solr", ()),
    ("spark", "spark", ()),
    ("sqoop", "sqoop", ("sqoop2",)),
    ("sqoop2", "sqoop2", ("sqoop",)),
    ("streamsmsgmgr", "streamsmsgmgr", ()),
    ("tez", "tez", ()),
    ("superset", "superset", ()),
    ("yarn", "yarn", ("hadoop", "supergroup")),
    ("zeppelin", "zeppelin", ()),
    ("zookeeper", "zookeeper", ()),
)

# identities.py:478-535 — every HDP user is secondary member of "hadoop"
# except "anonymous".
_HDP_USER_NAMES = (
    "accumulo", "activity_analyzer", "activity_explorer", "ambari-qa",
    "ambari-server", "ams", "anonymous", "atlas", "druid", "falcon",
    "flume", "gpadmin", "hadoopqa", "hbase", "hcat", "hdfs", "hive",
    "HTTP", "hue", "infra-solr", "kafka", "keyadmin", "kms", "knox",
    "livy", "logsearch", "mahout", "mapred", "oozie", "ranger",
    "rangerlookup", "spark", "sqoop", "storm", "tez", "tracer", "yarn",
    "yarn-ats", "yarn-ats-hbase", "zeppelin", "zookeeper",
)
_HDP_USERS = tuple(
    (name, name, () if name == "anonymous" else ("hadoop",))
    for name in _HDP_USER_NAMES
)

# (proxy_name, ((member_name, member_type), ...)) — identities.py:384-392,455-468,519-530
_CDH_SMOKE = ("cloudera-scm", "user")
_HDP_SMOKE = ("ambari-qa", "user")
_HADOOP_G = ("hadoop", "group")

_CDH_PROXY = (
    ("flume", (_CDH_SMOKE, _HADOOP_G)),
    ("hive", (_CDH_SMOKE, _HADOOP_G)),
    ("HTTP", (_CDH_SMOKE,)),
    ("hue", (_CDH_SMOKE, _HADOOP_G)),
    ("impala", (_CDH_SMOKE, _HADOOP_G)),
    ("mapred", (_CDH_SMOKE, _HADOOP_G)),
    ("oozie", (_CDH_SMOKE, _HADOOP_G)),
)
_CDP_PROXY = (
    ("flume", (_CDH_SMOKE, _HADOOP_G)),
    ("hive", (_CDH_SMOKE, _HADOOP_G)),
    ("hue", (_CDH_SMOKE, _HADOOP_G)),
    ("impala", (_CDH_SMOKE, _HADOOP_G)),
    ("mapred", (_CDH_SMOKE, _HADOOP_G)),
    ("oozie", (_CDH_SMOKE, _HADOOP_G)),
    ("phoenix", (_CDH_SMOKE, _HADOOP_G)),
    ("yarn", (_CDH_SMOKE, _HADOOP_G)),
    ("knox", (_CDH_SMOKE, _HADOOP_G)),
    ("hdfs", (_CDH_SMOKE, _HADOOP_G)),
    ("livy", (_CDH_SMOKE, _HADOOP_G)),
    ("HTTP", (_CDH_SMOKE,)),
)
_HDP_PROXY = (
    ("ambari-server", (_HDP_SMOKE,)),
    ("flume", (_HDP_SMOKE, _HADOOP_G)),
    ("hbase", (_HDP_SMOKE, _HADOOP_G)),
    ("hcat", (_HDP_SMOKE, _HADOOP_G)),
    ("hive", (_HDP_SMOKE, _HADOOP_G)),
    ("HTTP", (_HDP_SMOKE,)),
    ("knox", (_HDP_SMOKE,)),
    ("livy", (_HDP_SMOKE, _HADOOP_G)),
    ("oozie", (_HDP_SMOKE, _HADOOP_G)),
    ("yarn", (_HDP_SMOKE, _HADOOP_G)),
)

_USERS = {"cdh": _CDH_USERS, "cdp": _CDP_USERS, "hdp": _HDP_USERS}
_PROXY = {"cdh": _CDH_PROXY, "cdp": _CDP_PROXY, "hdp": _HDP_PROXY}

# (path, owner, group, mode) in parent-first order — directories.py:117-140
_CDH_DIRS = (
    ("/", "hdfs", "hadoop", 0o755),
    ("/hbase", "hbase", "hbase", 0o755),
    ("/solr", "solr", "solr", 0o775),
    ("/tmp", "hdfs", "supergroup", 0o1777),
    ("/tmp/hive", "hive", "supergroup", 0o777),
    ("/tmp/logs", "mapred", "hadoop", 0o1777),
    ("/user", "hdfs", "supergroup", 0o755),
    ("/user/flume", "flume", "flume", 0o775),
    ("/user/hdfs", "hdfs", "hdfs", 0o755),
    ("/user/history", "mapred", "hadoop", 0o777),
    ("/user/hive", "hive", "hive", 0o775),
    ("/user/hive/warehouse", "hive", "hive", 0o1777),
    ("/user/hue", "hue", "hue", 0o755),
    ("/user/hue/.cloudera_manager_hive_metastore_canary", "hue", "hue", 0o777),
    ("/user/impala", "impala", "impala", 0o775),
    ("/user/oozie", "oozie", "oozie", 0o775),
    ("/user/spark", "spark", "spark", 0o751),
    ("/user/spark/applicationHistory", "spark", "spark", 0o1777),
    ("/user/sqoop2", "sqoop2", "sqoop", 0o775),
    ("/user/yarn", "yarn", "yarn", 0o755),
)

# directories.py:149-194
_CDP_DIRS = (
    ("/", "hdfs", "hadoop", 0o755),
    ("/hbase", "hbase", "hbase", 0o755),
    ("/ranger", "hdfs", "supergroup", 0o755),
    ("/ranger/audit", "hdfs", "supergroup", 0o755),
    ("/solr", "solr", "solr", 0o775),
    ("/tmp", "hdfs", "supergroup", 0o1777),
    ("/tmp/hive", "hive", "supergroup", 0o777),
    ("/tmp/logs", "yarn", "hadoop", 0o1777),
    ("/user", "hdfs", "supergroup", 0o755),
    ("/user/flume", "flume", "flume", 0o775),
    ("/user/hdfs", "hdfs", "hdfs", 0o755),
    ("/user/history", "mapred", "hadoop", 0o777),
    ("/user/history/done_intermediate", "mapred", "hadoop", 0o1777),
    ("/user/hive", "hive", "hive", 0o775),
    ("/user/hive/warehouse", "hive", "hive", 0o1777),
    ("/user/hue", "hue", "hue", 0o755),
    ("/user/hue/.cloudera_manager_hive_metastore_canary", "hue", "hue", 0o777),
    ("/user/impala", "impala", "impala", 0o775),
    ("/user/livy", "livy", "livy", 0o775),
    ("/user/oozie", "oozie", "oozie", 0o775),
    ("/user/spark", "spark", "spark", 0o751),
    ("/user/spark/applicationHistory", "spark", "spark", 0o1777),
    ("/user/spark/spark3ApplicationHistory", "spark", "spark", 0o1777),
    ("/user/spark/driverLogs", "spark", "spark", 0o1777),
    ("/user/spark/driver3Logs", "spark", "spark", 0o1777),
    ("/user/sqoop", "sqoop", "sqoop", 0o775),
    ("/user/sqoop2", "sqoop2", "sqoop", 0o775),
    ("/user/tez", "hdfs", "supergroup", 0o775),
    ("/user/yarn", "hdfs", "supergroup", 0o775),
    ("/user/yarn/mapreduce", "hdfs", "supergroup", 0o775),
    ("/user/yarn/mapreduce/mr-framework", "yarn", "hadoop", 0o775),
    ("/user/yarn/services", "hdfs", "supergroup", 0o775),
    ("/user/yarn/services/service-framework", "hdfs", "supergroup", 0o775),
    ("/user/zeppelin", "zeppelin", "zeppelin", 0o775),
    ("/warehouse", "hdfs", "supergroup", 0o775),
    ("/warehouse/tablespace", "hdfs", "supergroup", 0o775),
    ("/warehouse/tablespace/external", "hdfs", "supergroup", 0o775),
    ("/warehouse/tablespace/managed", "hdfs", "supergroup", 0o775),
    ("/warehouse/tablespace/external/hive", "hive", "hive", 0o1775),
    ("/warehouse/tablespace/managed/hive", "hive", "hive", 0o1775),
    ("/yarn", "yarn", "yarn", 0o700),
    ("/yarn/node-labels", "yarn", "yarn", 0o700),
)

# directories.py:203-236
_HDP_DIRS = (
    ("/", "hdfs", "hadoop", 0o755),
    ("/app-logs", "yarn", "hadoop", 0o1777),
    ("/app-logs/ambari-qa", "ambari-qa", "hadoop", 0o770),
    ("/app-logs/ambari-qa/logs", "ambari-qa", "hadoop", 0o770),
    ("/apps", "hdfs", "hadoop", 0o755),
    ("/apps/accumulo", "accumulo", "hadoop", 0o750),
    ("/apps/falcon", "falcon", "hdfs", 0o777),
    ("/apps/hbase", "hdfs", "hadoop", 0o755),
    ("/apps/hbase/data", "hbase", "hadoop", 0o775),
    ("/apps/hbase/staging", "hbase", "hadoop", 0o711),
    ("/apps/hive", "hdfs", "hdfs", 0o755),
    ("/apps/hive/warehouse", "hive", "hdfs", 0o777),
    ("/apps/tez", "tez", "hdfs", 0o755),
    ("/apps/webhcat", "hcat", "hdfs", 0o755),
    ("/ats", "yarn", "hdfs", 0o755),
    ("/ats/done", "yarn", "hdfs", 0o775),
    ("/atsv2", "yarn-ats", "hadoop", 0o755),
    ("/mapred", "mapred", "hadoop", 0o755),
    ("/mapred/system", "mapred", "hadoop", 0o755),
    ("/system", "yarn", "hadoop", 0o755),
    ("/system/yarn", "yarn", "hadoop", 0o755),
    ("/system/yarn/node-labels", "yarn", "hadoop", 0o700),
    ("/tmp", "hdfs", "hdfs", 0o1777),
    ("/tmp/hive", "ambari-qa", "hdfs", 0o777),
    ("/user", "hdfs", "hdfs", 0o755),
    ("/user/ambari-qa", "ambari-qa", "hdfs", 0o770),
    ("/user/hcat", "hcat", "hdfs", 0o755),
    ("/user/hdfs", "hdfs", "hdfs", 0o755),
    ("/user/hive", "hive", "hdfs", 0o700),
    ("/user/hue", "hue", "hue", 0o755),
    ("/user/oozie", "oozie", "hdfs", 0o775),
    ("/user/yarn", "yarn", "hdfs", 0o755),
)

_DIRS = {"cdh": _CDH_DIRS, "cdp": _CDP_DIRS, "hdp": _HDP_DIRS}


# ---------------------------------------------------------------- rows

def user_rows(dist: str, zone: str = "zone1") -> list[tuple[str, str]]:
    """(user_name, primary_group) rows; ``admin`` present iff zone is
    not System (case-insensitive, ``identities.py:394-396``)."""
    rows = [(name, pgroup) for name, pgroup, _ in _USERS[dist]]
    if zone.lower() != "system":
        rows.append(("admin", "admin"))
    return sorted(rows)


def membership_rows(dist: str) -> list[tuple[str, str]]:
    """(user_name, group_name) flatten of the secondary-group sets
    (``identities.py:299-306``)."""
    return sorted(
        (name, grp) for name, _, sgroups in _USERS[dist] for grp in sgroups
    )


def group_rows(dist: str, zone: str = "zone1") -> list[tuple[str]]:
    """All group names: declared ∪ primary ∪ secondary
    (``identities.py:293-303`` dedup semantics)."""
    names = set()
    for name, pgroup, sgroups in _USERS[dist]:
        names.add(pgroup)
        names.update(sgroups)
    if zone.lower() != "system":
        names.add("admin")
    return sorted((n,) for n in names)


def proxy_user_rows(dist: str) -> list[tuple[str, str, str]]:
    """(proxy_name, member_name, member_type) flatten
    (``identities.py:308-309,384-392``)."""
    return sorted(
        (proxy, member, mtype)
        for proxy, members in _PROXY[dist]
        for member, mtype in members
    )


def directory_rows(dist: str) -> list[tuple[int, str, str, str, int]]:
    """(seq, path, owner, group, mode) with parent-first ``seq``
    (``directories.py:115-240``; order is significant)."""
    return [
        (seq, path, owner, group, mode)
        for seq, (path, owner, group, mode) in enumerate(_DIRS[dist])
    ]


# ----------------------------------------------------------- DataFrames

USERS_SCHEMA = T.StructType(
    [
        T.StructField("user_name", T.StringType(), False),
        T.StructField("primary_group", T.StringType(), False),
    ]
)
GROUPS_SCHEMA = T.StructType([T.StructField("group_name", T.StringType(), False)])
MEMBERSHIPS_SCHEMA = T.StructType(
    [
        T.StructField("user_name", T.StringType(), False),
        T.StructField("group_name", T.StringType(), False),
    ]
)
PROXY_USERS_SCHEMA = T.StructType(
    [
        T.StructField("proxy_name", T.StringType(), False),
        T.StructField("member_name", T.StringType(), False),
        T.StructField("member_type", T.StringType(), False),
    ]
)
DIRECTORIES_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("owner", T.StringType(), False),
        T.StructField("group", T.StringType(), False),
        T.StructField("mode", T.IntegerType(), False),
    ]
)


def users_df(spark: SparkSession, dist: str, zone: str = "zone1") -> DataFrame:
    return local_df(spark, user_rows(dist, zone), USERS_SCHEMA)


def groups_df(spark: SparkSession, dist: str, zone: str = "zone1") -> DataFrame:
    return local_df(spark, group_rows(dist, zone), GROUPS_SCHEMA)


def memberships_df(spark: SparkSession, dist: str) -> DataFrame:
    return local_df(spark, membership_rows(dist), MEMBERSHIPS_SCHEMA)


def proxy_users_df(spark: SparkSession, dist: str) -> DataFrame:
    return local_df(spark, proxy_user_rows(dist), PROXY_USERS_SCHEMA)


def directories_df(spark: SparkSession, dist: str) -> DataFrame:
    return local_df(spark, directory_rows(dist), DIRECTORIES_SCHEMA)
