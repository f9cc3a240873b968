"""deltalake-compatible schema mirror classes.

The reference exposes ``Schema`` / ``Field`` / ``PrimitiveType`` /
``ArrayType`` / ``MapType`` / ``StructType`` (reference:
python/deltalake/schema.py:1-26 re-exporting python/src/schema.rs) so
user code does ``dt.schema().fields[0].type.type == "string"``. This
module mirrors that surface over the Delta protocol's JSON schema
serialization (which Spark's ``StructType.json()`` shares), with
converters to/from Spark types so both worlds interoperate.
"""

from __future__ import annotations

import json
from typing import Any, Union

from pyspark.sql import types as T

_PRIMITIVES = {
    "string",
    "long",
    "integer",
    "short",
    "byte",
    "float",
    "double",
    "boolean",
    "binary",
    "date",
    "timestamp",
    "timestamp_ntz",
}


class PrimitiveType:
    """A primitive delta type, e.g. ``PrimitiveType("long")`` or
    ``PrimitiveType("decimal(10,2)")``."""

    def __init__(self, data_type: str):
        t = str(data_type)
        if t not in _PRIMITIVES and not t.startswith("decimal"):
            raise ValueError(f"unknown primitive type {data_type!r}")
        self.type = t

    def to_json(self) -> str:
        return json.dumps(self.type)

    @staticmethod
    def from_json(raw: str) -> "PrimitiveType":
        return PrimitiveType(json.loads(raw))

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, PrimitiveType) and self.type == other.type

    def __repr__(self) -> str:
        return f"PrimitiveType({self.type!r})"


class VariantType:
    """The Delta variant type (semi-structured values; reference:
    python/src/schema.rs:189 VariantType). Serializes as the primitive
    string ``"variant"`` — the same JSON Spark 4's ``T.VariantType``
    emits, so Spark conversion stays lossless."""

    def __init__(self):
        self.type = "variant"

    def to_json(self) -> str:
        return json.dumps(self.type)

    @staticmethod
    def from_json(raw: str) -> "VariantType":
        if json.loads(raw) != "variant":
            raise ValueError(f"not a variant type: {raw!r}")
        return VariantType()

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, VariantType)

    def __repr__(self) -> str:
        return "VariantType()"


class ArrayType:
    def __init__(self, element_type: Any, contains_null: bool = True):
        self.type = "array"
        self.element_type = element_type
        self.contains_null = contains_null

    def to_json(self) -> str:
        return json.dumps(_type_to_obj(self))

    @staticmethod
    def from_json(raw: str) -> "ArrayType":
        return _type_from_obj(json.loads(raw))

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, ArrayType)
            and self.element_type == other.element_type
            and self.contains_null == other.contains_null
        )

    def __repr__(self) -> str:
        return f"ArrayType({self.element_type!r}, contains_null={self.contains_null})"


class MapType:
    def __init__(self, key_type: Any, value_type: Any, value_contains_null: bool = True):
        self.type = "map"
        self.key_type = key_type
        self.value_type = value_type
        self.value_contains_null = value_contains_null

    def to_json(self) -> str:
        return json.dumps(_type_to_obj(self))

    @staticmethod
    def from_json(raw: str) -> "MapType":
        return _type_from_obj(json.loads(raw))

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, MapType)
            and self.key_type == other.key_type
            and self.value_type == other.value_type
            and self.value_contains_null == other.value_contains_null
        )

    def __repr__(self) -> str:
        return f"MapType({self.key_type!r}, {self.value_type!r})"


class Field:
    def __init__(
        self,
        name: str,
        type: Any,  # noqa: A002 - mirrors the reference signature
        nullable: bool = True,
        metadata: dict[str, Any] | None = None,
    ):
        self.name = name
        self.type = type
        self.nullable = nullable
        self.metadata = dict(metadata or {})

    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "type": _type_to_obj(self.type),
                "nullable": self.nullable,
                "metadata": self.metadata,
            }
        )

    @staticmethod
    def from_json(raw: str) -> "Field":
        d = json.loads(raw)
        return Field(
            d["name"],
            _type_from_obj(d["type"]),
            d.get("nullable", True),
            d.get("metadata") or {},
        )

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, Field)
            and self.name == other.name
            and self.type == other.type
            and self.nullable == other.nullable
            and self.metadata == other.metadata
        )

    def __repr__(self) -> str:
        return f"Field({self.name!r}, {self.type!r}, nullable={self.nullable})"


class StructType:
    def __init__(self, fields: list[Field]):
        self.type = "struct"
        self.fields = list(fields)

    def to_json(self) -> str:
        return json.dumps(_type_to_obj(self))

    @staticmethod
    def from_json(raw: str) -> "StructType":
        return _type_from_obj(json.loads(raw))

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, (StructType, Schema)) and self.fields == other.fields

    def __repr__(self) -> str:
        return f"StructType({self.fields!r})"


class Schema(StructType):
    """Top-level table schema (reference: deltalake.Schema)."""

    @staticmethod
    def from_json(raw: str) -> "Schema":
        st = _type_from_obj(json.loads(raw))
        return Schema(st.fields)

    def to_pyspark(self) -> T.StructType:
        return to_spark(self)

    @staticmethod
    def from_pyspark(schema: T.StructType) -> "Schema":
        return Schema(from_spark(schema).fields)

    def __repr__(self) -> str:
        return f"Schema({self.fields!r})"


# -- JSON (Delta protocol) <-> mirror classes --------------------------------


def _type_to_obj(t: Any) -> Any:
    if isinstance(t, VariantType):
        return t.type
    if isinstance(t, PrimitiveType):
        return t.type
    if isinstance(t, str):
        if t == "variant":
            return t
        return PrimitiveType(t).type
    if isinstance(t, ArrayType):
        return {
            "type": "array",
            "elementType": _type_to_obj(t.element_type),
            "containsNull": t.contains_null,
        }
    if isinstance(t, MapType):
        return {
            "type": "map",
            "keyType": _type_to_obj(t.key_type),
            "valueType": _type_to_obj(t.value_type),
            "valueContainsNull": t.value_contains_null,
        }
    if isinstance(t, StructType):
        return {
            "type": "struct",
            "fields": [json.loads(f.to_json()) for f in t.fields],
        }
    raise TypeError(f"not a delta type: {t!r}")


def _type_from_obj(obj: Any) -> Any:
    if isinstance(obj, str):
        if obj == "variant":
            return VariantType()
        return PrimitiveType(obj)
    kind = obj.get("type")
    if kind == "array":
        return ArrayType(_type_from_obj(obj["elementType"]), obj.get("containsNull", True))
    if kind == "map":
        return MapType(
            _type_from_obj(obj["keyType"]),
            _type_from_obj(obj["valueType"]),
            obj.get("valueContainsNull", True),
        )
    if kind == "struct":
        return StructType(
            [
                Field(
                    f["name"],
                    _type_from_obj(f["type"]),
                    f.get("nullable", True),
                    f.get("metadata") or {},
                )
                for f in obj["fields"]
            ]
        )
    raise ValueError(f"unknown type object {obj!r}")


# -- Spark <-> mirror classes ------------------------------------------------
# The Delta protocol's JSON schema layout IS Spark's StructType.json()
# layout, so conversion goes through JSON: lossless both ways.


def to_spark(t: Schema | StructType) -> T.StructType:
    return T.StructType.fromJson(json.loads(t.to_json()))


def from_spark(schema: T.StructType) -> Schema:
    return Schema.from_json(schema.json())


# reference python/deltalake/schema.py:26 — the union of all delta types
DataType = Union[
    "PrimitiveType", "MapType", "StructType", "ArrayType", "VariantType"
]
