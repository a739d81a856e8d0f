"""Unit tests for the JDBC adapters' pure construction logic (reference
S4-S7). No driver jars exist in this environment, so execution cannot be
tested — but the partitioning contract, pushdown subquery shape, and
option plumbing can (and a wrong numPartitions/bounds string is exactly
the kind of bug that otherwise only surfaces against a live database).
"""

from __future__ import annotations

import pytest

from oracle_to_snowflake_etl_spark.sources.jdbc import (
    ORACLE_URL_TEMPLATE,
    jdbc_scan_options,
    jdbc_write_options,
    key_projection_subquery,
)

URL = ORACLE_URL_TEMPLATE.format(host="db", port=1521, service="XE")


def test_scan_options_partitioned():
    opts = jdbc_scan_options(
        URL, "ADS_DATA", user="u", password="p",
        driver="oracle.jdbc.OracleDriver",
        partition_column="CAMPAIGN_ID", lower_bound=1, upper_bound=50,
        num_partitions=8, fetch_size=5000)
    assert opts["url"] == URL
    assert opts["partitionColumn"] == "CAMPAIGN_ID"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "50")
    assert opts["numPartitions"] == "8"
    assert opts["fetchsize"] == "5000"
    assert opts["driver"] == "oracle.jdbc.OracleDriver"


def test_scan_options_require_bounds_with_partition_column():
    with pytest.raises(ValueError, match="lower_bound/upper_bound"):
        jdbc_scan_options(URL, "T", partition_column="ID")


def test_scan_options_unpartitioned_has_no_partition_keys():
    opts = jdbc_scan_options(URL, "T")
    assert "partitionColumn" not in opts
    assert "numPartitions" not in opts


def test_key_projection_subquery_shapes():
    """Reference S6 (oracle_to_snowflake.py:78): remote key projection."""
    q = key_projection_subquery(
        "ADS_DATA", ["CAMPAIGN_ID", "ADSET_ID", "CREATIVE_ID", "DT"])
    assert q == ("(SELECT CAMPAIGN_ID, ADSET_ID, CREATIVE_ID, DT "
                 "FROM ADS_DATA) src")
    q2 = key_projection_subquery(
        "ADS_DATA", ["CAMPAIGN_ID"], predicate="DT >= DATE '2026-08-01'",
        alias="keys")
    assert q2 == ("(SELECT CAMPAIGN_ID FROM ADS_DATA "
                  "WHERE DT >= DATE '2026-08-01') keys")


def test_write_options_batching_and_extras():
    opts = jdbc_write_options(URL, "ADS_DATA_STG", batch_size=2500,
                              options={"isolationLevel": "READ_COMMITTED"})
    assert opts["batchsize"] == "2500"
    assert opts["isolationLevel"] == "READ_COMMITTED"
    assert opts["dbtable"] == "ADS_DATA_STG"


def test_resolve_jdbc_env_oracle_template():
    from oracle_to_snowflake_etl_spark.sources.jdbc import (
        ORACLE_URL_TEMPLATE,
        SNOWFLAKE_URL_TEMPLATE,
        resolve_jdbc_env,
    )

    env = {"ORACLE_HOST": "dbhost", "ORACLE_PORT": "1521",
           "ORACLE_SERVICE": "XEPDB1", "ORACLE_USER": "scott",
           "ORACLE_PASSWORD": "tiger", "OTHER_USER": "nope"}
    got = resolve_jdbc_env("ORACLE", env, template=ORACLE_URL_TEMPLATE)
    assert got == {"url": "jdbc:oracle:thin:@//dbhost:1521/XEPDB1",
                   "user": "scott", "password": "tiger"}
    # explicit URL beats the template; missing fields omit the url key
    env2 = {"SNOWFLAKE_URL": "jdbc:snowflake://me.snowflakecomputing.com",
            "SNOWFLAKE_ACCOUNT": "ignored", "SNOWFLAKE_DRIVER": "d.Cls"}
    got2 = resolve_jdbc_env("SNOWFLAKE", env2,
                            template=SNOWFLAKE_URL_TEMPLATE)
    assert got2["url"] == "jdbc:snowflake://me.snowflakecomputing.com"
    assert got2["driver"] == "d.Cls"
    assert resolve_jdbc_env("SNOWFLAKE", {"SNOWFLAKE_USER": "u"},
                            template=SNOWFLAKE_URL_TEMPLATE) == {"user": "u"}
    # resolved kwargs feed the option builders directly
    from oracle_to_snowflake_etl_spark.sources.jdbc import jdbc_scan_options

    opts = jdbc_scan_options(table="ADS_DATA", **got)
    assert opts["url"].startswith("jdbc:oracle:thin")
    assert opts["user"] == "scott"
