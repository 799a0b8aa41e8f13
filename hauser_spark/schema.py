"""Export schema: the fixed base + dynamic tail schema system of the reference.

Re-expresses ``warehouse/schema.go`` (reference): the compiled-in 60-column
``BaseExportFields`` + optional 8-column ``MobileFields``, the sync-table
schema, case-insensitive reconciliation against a pre-existing destination
table (order-preserving, legacy renames honored, missing fields appended),
and the FullStory field list with custom-var wildcards.

Reference citations:
- field structs:      warehouse/schema.go:9-82
- sync table:         warehouse/schema.go:91-95
- special-case names: warehouse/schema.go:147-158 (PageAgent→PageUserAgent)
- reconcile:          warehouse/schema.go:203-220
- wildcards:          warehouse/schema.go:84-88
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

# Field type tags: the reference's 5-type universe (warehouse/schema.go via
# reflection; type maps warehouse/redshift.go:24-31, warehouse/bigquery.go:16-23).
INT64 = "int64"
INT32 = "int32"
FLOAT64 = "float64"
STRING = "string"
TIME = "time"

_SPARK_TYPES = {
    INT64: T.LongType(),
    INT32: T.IntegerType(),
    FLOAT64: T.DoubleType(),
    STRING: T.StringType(),
    TIME: T.TimestampType(),
}

# (name, type) in declaration order — warehouse/schema.go:9-69.
BASE_EXPORT_FIELDS: tuple[tuple[str, str], ...] = (
    ("IndvId", INT64),
    ("UserId", INT64),
    ("SessionId", INT64),
    ("PageId", INT64),
    ("UserCreated", TIME),
    ("UserAppKey", STRING),
    ("UserDisplayName", STRING),
    ("UserEmail", STRING),
    ("EventStart", TIME),
    ("EventType", STRING),
    ("EventSubType", STRING),
    ("EventCustomName", STRING),
    ("EventTargetText", STRING),
    ("EventTargetSelector", STRING),
    ("EventPageOffset", INT64),
    ("EventSessionOffset", INT64),
    ("EventModFrustrated", INT64),
    ("EventModDead", INT64),
    ("EventModError", INT64),
    ("EventModSuspicious", INT64),
    ("EventVarErrorKind", STRING),
    ("EventVarFields", STRING),
    ("EventWebSourceFileUrl", STRING),
    ("EventFirstInputDelay", INT64),
    ("EventCumulativeLayoutShift", FLOAT64),
    ("SessionStart", TIME),
    ("PageName", STRING),
    ("PageStart", TIME),
    ("PageDuration", INT64),
    ("PageActiveDuration", INT64),
    ("PageUrl", STRING),
    ("PageRefererUrl", STRING),
    ("PageIp", STRING),
    ("PageLatLong", STRING),
    ("PageUserAgent", STRING),
    ("PageBrowser", STRING),
    ("PageBrowserVersion", STRING),
    ("PageDevice", STRING),
    ("PagePlatform", STRING),
    ("PageOperatingSystem", STRING),
    ("PageScreenWidth", INT64),
    ("PageScreenHeight", INT64),
    ("PageViewportWidth", INT64),
    ("PageViewportHeight", INT64),
    ("PageNumEvents", INT32),
    ("PageNumDerivedEvents", INT32),
    ("PageNumInfos", INT64),
    ("PageNumWarnings", INT64),
    ("PageNumErrors", INT64),
    ("PageClusterId", INT64),
    ("PageMaxScrollDepthPercent", INT64),
    ("LoadDomContentTime", INT64),
    ("LoadEventTime", INT64),
    ("LoadFirstPaintTime", INT64),
    ("LoadLargestPaintTime", INT64),
    ("ReqUrl", STRING),
    ("ReqMethod", STRING),
    ("ReqStatus", INT64),
    ("CustomVars", STRING),
)

# warehouse/schema.go:73-82 — appended when IncludeMobileAppsFields is set.
MOBILE_FIELDS: tuple[tuple[str, str], ...] = (
    ("AppName", STRING),
    ("AppPackageName", STRING),
    ("AppDeviceModel", STRING),
    ("AppDeviceVendor", STRING),
    ("AppVersion", STRING),
    ("AppOsVersion", STRING),
    ("AppViewName", STRING),
    ("EventMobileSourceFile", STRING),
)

# warehouse/schema.go:84-88 — custom-var families requested from the export.
WILDCARD_FIELDS = ("user_*", "evt_*", "page_*")

# warehouse/schema.go:91-95.
SYNC_TABLE_SPARK_SCHEMA = T.StructType(
    [
        T.StructField("ID", T.LongType()),
        T.StructField("Processed", T.TimestampType()),
        T.StructField("BundleEndTime", T.TimestampType()),
    ]
)


@dataclass(frozen=True)
class WarehouseField:
    """Mirror of warehouse/schema.go:98-115.

    db_name: column name in the destination table.
    fs_field_name: source field name from the export ("" = destination-only
        column, null-filled on every row).
    field_type: one of the 5 type tags, or None for destination-only columns.
    """

    db_name: str
    fs_field_name: str = ""
    field_type: str | None = None

    @property
    def is_time(self) -> bool:
        return self.field_type == TIME

    def spark_type(self) -> T.DataType:
        if self.field_type is None:
            return T.StringType()
        return _SPARK_TYPES[self.field_type]


# warehouse/schema.go:147-158 — legacy rename special cases, keyed lowercase.
SPECIAL_CASED_FIELDS: dict[str, WarehouseField] = {
    "pageagent": WarehouseField("PageAgent", "PageUserAgent", STRING),
    "eventtargetselectortok": WarehouseField(
        "EventTargetSelectorTok", "EventTargetSelectorTok", STRING
    ),
}


class Schema:
    """An ordered list of WarehouseFields (warehouse/schema.go:121)."""

    def __init__(self, fields: list[WarehouseField]):
        self.fields = list(fields)

    def __iter__(self):
        return iter(self.fields)

    def __len__(self):
        return len(self.fields)

    def __eq__(self, other):
        return isinstance(other, Schema) and self.fields == other.fields

    def db_names(self) -> list[str]:
        return [f.db_name for f in self.fields]

    def is_compatible_with(self, other: "Schema") -> bool:
        """warehouse/schema.go:135-145 — self must be a case-insensitive
        name-prefix of other (append-only evolution)."""
        if len(self.fields) > len(other.fields):
            return False
        return all(
            a.db_name.lower() == b.db_name.lower()
            for a, b in zip(self.fields, other.fields)
        )

    def get_field_for_name(self, col: str) -> WarehouseField:
        """warehouse/schema.go:162-174 — legacy special cases first, then
        case-insensitive match, else a destination-only field."""
        special = SPECIAL_CASED_FIELDS.get(col.lower())
        if special is not None:
            return special
        for field in self.fields:
            if field.db_name.lower() == col.lower():
                return field
        return WarehouseField(db_name=col)

    def get_fullstory_fields(self) -> list[str]:
        """warehouse/schema.go:176-190 — export request field list;
        CustomVars expands to the wildcard families."""
        out: list[str] = []
        for field in self.fields:
            if field.fs_field_name == "CustomVars":
                out.extend(WILDCARD_FIELDS)
            elif field.fs_field_name:
                out.append(field.fs_field_name)
        return out

    def get_missing_fields_for(self, existing: "Schema") -> list[WarehouseField]:
        """warehouse/schema.go:212-220 — fields of self absent (by
        fs_field_name) from existing."""
        have = {f.fs_field_name for f in existing.fields}
        return [f for f in self.fields if f.fs_field_name not in have]

    def reconcile_with_existing(self, col_names: list[str]) -> "Schema":
        """warehouse/schema.go:203-210 — destination column order wins;
        missing export fields appended at the end."""
        new_fields = [self.get_field_for_name(c) for c in col_names]
        new_fields += self.get_missing_fields_for(Schema(new_fields))
        return Schema(new_fields)

    def to_spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.db_name, f.spark_type()) for f in self.fields]
        )


def make_schema(include_mobile: bool = False) -> Schema:
    """warehouse/schema.go:222-235 + internal/service.go:53-67."""
    pairs = list(BASE_EXPORT_FIELDS)
    if include_mobile:
        pairs += list(MOBILE_FIELDS)
    return Schema([WarehouseField(n, n, t) for n, t in pairs])
