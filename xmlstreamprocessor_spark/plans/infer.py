"""Extraction-spec inference from sample documents.

The reference has no inference — schemas are always user-declared
(Parser.cs: the lambda IS the schema).  Spark's ``schema_of_xml`` shows the
extension is natural, but it infers a *Spark* schema; this module infers an
*extraction spec* (``X.struct``), so the result slots straight into both
execution paths (``extract_xml`` / ``extract_xml_jvm``) and can be edited by
hand afterwards — inference is a starting point, the declared spec stays the
contract.

Rules (applied over ALL samples, widening on conflict):
- attributes -> ``X.attr``
- scalar child (no sub-elements): int -> nint, decimal -> ndecimal,
  true/false -> nbool, ISO datetime -> ndate, else string; any conflict
  widens (int+decimal -> ndecimal, anything+string -> string)
- child with sub-elements, at most one occurrence per parent -> nested
  ``X.struct``
- child whose sub-elements are a single repeated scalar tag ->
  ``X.array(container, scalar)``
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import xml.etree.ElementTree as ET
from collections.abc import Iterable

from xmlstreamprocessor_spark.plans.spec import Spec, Struct, X, _localname

# widening lattice: later entries absorb earlier ones
_ORDER = ["int", "decimal", "bool", "datetime", "string"]


def _classify(text: str) -> str:
    t = text.strip()
    if t == "":
        return "int"  # empty carries no information; weakest type
    if t.lower() in ("true", "false"):
        return "bool"
    try:
        int(t)
        return "int"
    except ValueError:
        pass
    try:
        _decimal.Decimal(t)
        return "decimal"
    except _decimal.InvalidOperation:
        pass
    try:
        _dt.datetime.fromisoformat(t)
        return "datetime"
    except ValueError:
        pass
    return "string"


def _widen(a: str | None, b: str) -> str:
    if a is None or a == b:
        return b
    if {a, b} == {"int", "decimal"}:
        return "decimal"
    return "string"


_MAKE = {
    "int": X.nint,
    "decimal": X.ndecimal,
    "bool": X.nbool,
    "datetime": X.ndate,
    "string": X.string,
}


def _infer_fields(elems: list) -> dict[str, Spec]:
    attrs: set[str] = set()
    scalar_types: dict[str, str] = {}
    struct_children: dict[str, list] = {}
    repeated_scalar: dict[str, tuple[str, str]] = {}  # container -> (tag, type)

    for elem in elems:
        attrs.update(elem.attrib)
        for child in elem:
            name = _localname(child.tag)
            if len(child) == 0:
                scalar_types[name] = _widen(
                    scalar_types.get(name), _classify(child.text or "")
                )
            else:
                sub_names = {_localname(c.tag) for c in child}
                sub_scalar = all(len(c) == 0 for c in child)
                if len(sub_names) == 1 and sub_scalar and len(child) > 1:
                    tag = next(iter(sub_names))
                    ty = None
                    for c in child:
                        ty = _widen(ty, _classify(c.text or ""))
                    prev = repeated_scalar.get(name)
                    repeated_scalar[name] = (
                        tag,
                        _widen(prev[1], ty) if prev else ty,
                    )
                else:
                    struct_children.setdefault(name, []).append(child)

    fields: dict[str, Spec] = {}
    for a in sorted(attrs):
        fields[a] = X.attr(a)
    for name in sorted(scalar_types):
        if name in repeated_scalar or name in struct_children:
            continue  # seen both shapes -> the structured shape wins
        fields[name] = _MAKE[scalar_types[name]](name)
    for name in sorted(repeated_scalar):
        tag, ty = repeated_scalar[name]
        fields[name] = X.array(name, _MAKE[ty](tag))
    for name in sorted(struct_children):
        fields[name] = Struct(name, _infer_fields(struct_children[name]))
    return fields


def infer_xml_spec(docs: Iterable[str]) -> Struct:
    """Infer an ``X.struct`` spec from sample XML documents (all sharing one
    root tag, which becomes the struct pattern)."""
    roots = [ET.fromstring(d) for d in docs]
    if not roots:
        raise ValueError("need at least one sample document")
    root_names = {_localname(r.tag) for r in roots}
    pattern = root_names.pop() if len(root_names) == 1 else "*"
    return Struct(pattern, _infer_fields(roots))
