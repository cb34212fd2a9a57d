"""Connector profiles — the per-database configuration surface (S2-S7).

The reference ships one module per database, each a thin declarative
config layer over the shared engine (SURVEY.md §2.1): what varies is the
connection properties, whether the connector needs a schema-history file,
and the snapshot-mode vocabulary.  Our engine has no live databases; a
profile maps each connector's semantics onto replay-plan settings
(``needs_schema_history`` → checkpoint strictness, snapshot-mode
remapping, property-key passthrough) so a reference user's task config
translates 1:1.

Citations: mysql `plugin-debezium-mysql/.../Capture.java:60-96`,
postgres `plugin-debezium-postgres/.../Capture.java:60-109`, mongodb
`plugin-debezium-mongodb/.../Capture.java:102-146`, oracle
`plugin-debezium-oracle/.../Capture.java:80-116`, sqlserver
`plugin-debezium-sqlserver/.../Capture.java:58-80`, db2
`plugin-debezium-db2/.../Capture.java:60-88`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from plugin_debezium_ray.config import CaptureConfig, SnapshotMode, join_properties


@dataclass(frozen=True)
class ConnectorProfile:
    """Declarative per-connector semantics."""

    name: str
    #: MySQL/Oracle/SQLServer/DB2 persist DDL in a schema-history file;
    #: Postgres/MongoDB carry schema in the stream (needDatabaseHistory(),
    #: e.g. mysql Capture.java:68-71 vs postgres Capture.java:94-97)
    needs_schema_history: bool
    #: connection property keys the profile accepts (passthrough surface)
    property_keys: tuple[str, ...] = ()
    #: connector-specific property defaults pushed into the plan
    defaults: dict = field(default_factory=dict)
    #: always emits full before/after images (mongodb capture.mode =
    #: change_streams_update_full_with_pre_image, Capture.java:138)
    full_images: bool = True

    def build_config(
        self,
        *,
        snapshot_mode: str = "INITIAL",
        included_tables=None,
        excluded_tables=None,
        included_columns=None,
        excluded_columns=None,
        properties: dict | None = None,
        **overrides,
    ) -> tuple[CaptureConfig, dict]:
        """Translate a reference-style task config into (CaptureConfig,
        effective-properties).  User ``properties`` merge LAST — the
        arbitrary-passthrough contract (`AbstractDebeziumTask.java:591-595`)."""
        cfg = CaptureConfig(
            snapshot_mode=SnapshotMode.from_string(snapshot_mode),
            included_tables=list(included_tables or []),
            excluded_tables=list(excluded_tables or []),
            included_columns=list(included_columns or []),
            excluded_columns=list(excluded_columns or []),
            **overrides,
        )
        props = dict(self.defaults)
        props["table.include.list"] = join_properties(included_tables)
        props["table.exclude.list"] = join_properties(excluded_tables)
        props["column.include.list"] = join_properties(included_columns)
        props["column.exclude.list"] = join_properties(excluded_columns)
        props["tombstones.on.delete"] = "false"  # AbstractDebeziumTask.java:561-562
        props = {k: v for k, v in props.items() if v is not None}
        props.update(properties or {})  # user overrides win
        return cfg, props


MYSQL = ConnectorProfile(
    name="mysql",
    needs_schema_history=True,
    property_keys=("hostname", "port", "username", "password", "serverId"),
    defaults={"include.schema.changes": "false"},  # mysql Capture.java:90
)

POSTGRES = ConnectorProfile(
    name="postgres",
    needs_schema_history=False,
    property_keys=(
        "hostname", "port", "username", "password", "database",
        "pluginName", "slotName", "publicationName", "sslMode",
        # SSL material (PostgresService.java:40-73) — fold into the
        # property plan with `sources.pgssl.handle_ssl_properties`
        # (PEM temp files + PKCS1→PKCS8 key conversion)
        "sslRootCert", "sslCert", "sslKey", "sslKeyPassword",
    ),
    defaults={"plugin.name": "pgoutput"},  # postgres Capture.java:72
)

MONGODB = ConnectorProfile(
    name="mongodb",
    needs_schema_history=False,
    property_keys=("connectionString",),
    defaults={
        # full before+after images — mongodb Capture.java:138
        "capture.mode": "change_streams_update_full_with_pre_image",
    },
)

ORACLE = ConnectorProfile(
    name="oracle",
    needs_schema_history=True,
    property_keys=("hostname", "port", "username", "password", "sid",
                   "pluggableDatabase"),
    defaults={"store.only.captured.tables.ddl": "false"},  # oracle Capture.java:104
)

SQLSERVER = ConnectorProfile(
    name="sqlserver",
    needs_schema_history=True,
    property_keys=("hostname", "port", "username", "password", "databaseNames"),
)

DB2 = ConnectorProfile(
    name="db2",
    needs_schema_history=True,
    property_keys=("hostname", "port", "username", "password", "database"),
)

PROFILES = {
    p.name: p for p in (MYSQL, POSTGRES, MONGODB, ORACLE, SQLSERVER, DB2)
}
