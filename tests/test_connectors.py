"""Connector profiles (S2-S7) and the JSON-image fallback (M11)."""

import pyarrow as pa

from plugin_debezium_ray.config import SnapshotMode, join_properties
from plugin_debezium_ray.sources.connectors import PROFILES
from plugin_debezium_ray.stages.jsonparse import parse_json_images


class TestProfiles:
    def test_history_requirements(self):
        """MySQL/Oracle/SQLServer/DB2 need schema history; Postgres and
        MongoDB carry schema in the stream (SURVEY.md §1.3)."""
        needs = {n: p.needs_schema_history for n, p in PROFILES.items()}
        assert needs == {
            "mysql": True, "oracle": True, "sqlserver": True, "db2": True,
            "postgres": False, "mongodb": False,
        }

    def test_build_config_and_property_merge(self):
        cfg, props = PROFILES["mysql"].build_config(
            snapshot_mode="schema_only",  # deprecated alias → NO_DATA
            included_tables=["db1.t1", "db1.t2"],
            properties={"include.schema.changes": "true", "custom.x": "1"},
        )
        assert cfg.snapshot_mode is SnapshotMode.NO_DATA
        assert props["table.include.list"] == "db1.t1,db1.t2"
        assert props["tombstones.on.delete"] == "false"
        # user properties merge LAST (AbstractDebeziumTask.java:591-595)
        assert props["include.schema.changes"] == "true"
        assert props["custom.x"] == "1"

    def test_mongodb_full_images(self):
        _, props = PROFILES["mongodb"].build_config()
        assert props["capture.mode"] == "change_streams_update_full_with_pre_image"

    def test_join_properties_escaping(self):
        """M10: scalar-or-list joiner with comma escaping
        (AbstractDebeziumTask.java:600-608)."""
        assert join_properties(None) is None
        assert join_properties("a") == "a"
        assert join_properties(["a", "b,c"]) == "a,b\\,c"


class TestJsonImages:
    def test_parse_string_images(self):
        ptype = pa.struct([("id", pa.int64()), ("name", pa.string())])
        t = pa.table(
            {
                "op": ["c", "d"],
                "before": pa.array([None, '{"id": 2, "name": "x"}'], pa.string()),
                "after": pa.array(['{"id": 1, "name": "a", "extra": 9}', None],
                                  pa.string()),
            }
        )
        out = parse_json_images(ptype)(t)
        assert out["after"][0].as_py() == {"id": 1, "name": "a"}  # extra dropped
        assert out["before"][1].as_py() == {"id": 2, "name": "x"}
        assert out["after"][1].as_py() is None

    def test_struct_images_untouched(self):
        ptype = pa.struct([("id", pa.int64())])
        t = pa.table({"after": pa.array([{"id": 5}], ptype)})
        out = parse_json_images(ptype)(t)
        assert out.equals(t)
