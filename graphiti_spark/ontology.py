"""User-suppliable ontology (E6) — the configuration surface for the
deterministic extraction rules.

The reference accepts custom Pydantic entity/edge types and filters:

  * ``validate_entity_types`` rejects custom types whose attribute fields
    collide with ``EntityNode``'s own field names
    (``graphiti_core/utils/ontology_utils/entity_types_utils.py:21-37``);
  * ``validate_excluded_entity_types`` checks exclusions against the
    available type names (``graphiti_core/helpers.py:150-181``) and
    ``extract_nodes`` drops entities of excluded types at extraction time
    (``utils/maintenance/node_operations.py:157-160``);
  * ``validate_group_id`` restricts group ids to ``[a-zA-Z0-9_-]``
    (``graphiti_core/helpers.py:128-148``);
  * an ``edge_type_map {(src_type, dst_type): [edge_type]}`` constrains
    which fact types apply between which entity-type signatures, with
    ``('Entity', 'Entity')`` as the catch-all default
    (``graphiti.py:461-466``, ``utils/maintenance/edge_operations.py:
    124-141``).

Our LLM stand-in is the sentence-template rule set in
:mod:`graphiti_spark.rules`; an :class:`Ontology` extends it at call time:
custom entity types (with reserved-name validation), excluded types,
caller-registered :class:`Template` patterns feeding the same matcher, and
extra functional/sentiment predicate declarations feeding temporal
versioning (T1/T2). Instances are immutable, picklable (compiled regexes
pickle by pattern source), and carry a stable :meth:`Ontology.fingerprint`
so checkpointed pipeline stages never alias across ontologies.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from graphiti_spark import rules

#: ``EntityNode`` model field names (``graphiti_core/nodes.py`` EntityNode:
#: uuid/name/group_id/labels/created_at + name_embedding/summary/attributes)
#: — custom entity-type attribute fields must not shadow these.
RESERVED_NODE_FIELDS = frozenset({
    "uuid", "name", "group_id", "labels", "created_at",
    "name_embedding", "summary", "attributes",
})

_GROUP_ID = re.compile(r"^[a-zA-Z0-9_-]+$")
_PRED = re.compile(r"^[A-Z][A-Z0-9_]*$")          # SCREAMING_SNAKE_CASE
_TYPE_NAME = re.compile(r"^[A-Za-z][A-Za-z0-9_]*$")

BUILTIN_ENTITY_TYPES = (rules.TYPE_SPEAKER, rules.TYPE_PERSON,
                        rules.TYPE_ORG, rules.TYPE_PLACE, rules.TYPE_ENTITY)


class EntityTypeValidationError(ValueError):
    """Custom entity type declares an attribute that shadows a reserved
    ``EntityNode`` field (``errors.py`` EntityTypeValidationError)."""

    def __init__(self, entity_type: str, field_name: str):
        super().__init__(
            f"entity type {entity_type!r} declares reserved attribute"
            f" field {field_name!r}")
        self.entity_type = entity_type
        self.field_name = field_name


class GroupIdValidationError(ValueError):
    def __init__(self, group_id: str):
        super().__init__(
            f"invalid group_id {group_id!r}: only ASCII alphanumerics,"
            " dashes and underscores are allowed")
        self.group_id = group_id


def validate_group_id(group_id: str) -> bool:
    """``helpers.py:128-148``: empty is allowed; otherwise
    ``[a-zA-Z0-9_-]+``."""
    if not group_id:
        return True
    if not _GROUP_ID.match(group_id):
        raise GroupIdValidationError(group_id)
    return True


def validate_entity_types(entity_types: dict[str, tuple[str, ...]] | None
                          ) -> bool:
    """``entity_types_utils.py:21-37``: every custom attribute field name
    is checked against the EntityNode field names."""
    if entity_types is None:
        return True
    for type_name, attr_fields in entity_types.items():
        if not _TYPE_NAME.match(type_name or ""):
            raise EntityTypeValidationError(type_name, "<type name>")
        for f in attr_fields:
            if f in RESERVED_NODE_FIELDS:
                raise EntityTypeValidationError(type_name, f)
    return True


def validate_excluded_entity_types(
        excluded: list[str] | None,
        entity_types: dict[str, tuple[str, ...]] | None = None) -> bool:
    """``helpers.py:150-181``: exclusions must name available types
    (builtins + customs; the reference's available set is ``{'Entity'}`` +
    customs — ours carries the five builtin stand-in types too)."""
    if not excluded:
        return True
    available = set(BUILTIN_ENTITY_TYPES)
    if entity_types:
        available.update(entity_types.keys())
    invalid = set(excluded) - available
    if invalid:
        raise ValueError(
            f"Invalid excluded entity types: {sorted(invalid)}."
            f" Available types: {sorted(available)}")
    return True


@dataclass(frozen=True)
class Template:
    """One caller-registered sentence template.

    ``pattern`` uses ``{a}``/``{b}`` entity slots (each matches a
    capitalized span) and, for ``mode='year'``, a ``{y}`` 4-digit year
    slot; everything else is matched literally. Example::

        Template("{a} acquired {b} in {y}", "ACQUIRED", mode="year",
                 subj_type="Organization", obj_type="Organization")

    ``mode`` follows the built-in rule set: ``pos`` → ``valid_at =
    episode ts``; ``neg`` → a negation row with ``invalid_at = ts``
    (T2 contradiction input); ``year`` → ``valid_at = Jan 1 of {y}``.
    """

    pattern: str
    pred: str
    mode: str = "pos"
    subj_type: str = rules.TYPE_ENTITY
    obj_type: str = rules.TYPE_ENTITY

    def compile(self) -> re.Pattern[str]:
        if not _PRED.match(self.pred):
            raise ValueError(
                f"predicate {self.pred!r} must be SCREAMING_SNAKE_CASE"
                " (prompts/extract_edges.py:20-38 convention)")
        if self.mode not in ("pos", "neg", "year"):
            raise ValueError(f"unknown template mode {self.mode!r}")
        if self.pattern.count("{a}") != 1 or self.pattern.count("{b}") != 1:
            raise ValueError(
                f"template {self.pattern!r} needs exactly one {{a}} and"
                " one {b} slot")
        if (self.mode == "year") != ("{y}" in self.pattern):
            raise ValueError("mode='year' requires (and is required by)"
                             " a {y} slot")
        out, pos = [], 0
        for m in re.finditer(r"\{[aby]\}", self.pattern):
            out.append(re.escape(self.pattern[pos:m.start()]))
            slot = m.group(0)[1]
            out.append(rf"(?P<{slot}>{rules._NAME})" if slot in "ab"
                       else r"(?P<y>\d{4})")
            pos = m.end()
        out.append(re.escape(self.pattern[pos:]))
        return re.compile("^" + "".join(out) + "$")


@dataclass(frozen=True)
class Ontology:
    """Immutable extraction configuration. All fields optional — the
    zero-arg instance behaves exactly like the built-in rule set."""

    entity_types: dict[str, tuple[str, ...]] = field(default_factory=dict)
    excluded_entity_types: frozenset[str] = frozenset()
    templates: tuple[Template, ...] = ()
    include_default_templates: bool = True
    functional_preds: frozenset[str] = frozenset()
    sentiment_preds: frozenset[str] = frozenset()
    #: {(subj_type, obj_type): (pred, ...)}; when non-empty, a custom
    #: template's pred must be admitted for its (subj_type, obj_type)
    #: signature, with ('Entity', 'Entity') as the catch-all — the
    #: deterministic mirror of the reference's edge_type_map constraint.
    edge_type_map: dict[tuple[str, str], tuple[str, ...]] = \
        field(default_factory=dict)

    def __post_init__(self):
        et = {k: tuple(v) for k, v in (self.entity_types or {}).items()}
        object.__setattr__(self, "entity_types", et)
        object.__setattr__(self, "excluded_entity_types",
                           frozenset(self.excluded_entity_types))
        object.__setattr__(self, "templates", tuple(self.templates))
        object.__setattr__(self, "functional_preds",
                           frozenset(self.functional_preds)
                           | rules.FUNCTIONAL_PREDS)
        object.__setattr__(self, "sentiment_preds",
                           frozenset(self.sentiment_preds)
                           | rules.SENTIMENT_PREDS)
        object.__setattr__(
            self, "edge_type_map",
            {tuple(k): tuple(v)
             for k, v in (self.edge_type_map or {}).items()})
        validate_entity_types(self.entity_types)
        validate_excluded_entity_types(
            sorted(self.excluded_entity_types), self.entity_types)
        known = set(BUILTIN_ENTITY_TYPES) | set(self.entity_types)
        compiled = []
        for t in self.templates:
            for ty in (t.subj_type, t.obj_type):
                if ty not in known:
                    raise ValueError(
                        f"template {t.pattern!r} references unregistered"
                        f" entity type {ty!r}")
            if self.edge_type_map:
                allowed = (self.edge_type_map.get((t.subj_type, t.obj_type),
                                                  ())
                           + self.edge_type_map.get(
                               (rules.TYPE_ENTITY, rules.TYPE_ENTITY), ()))
                if t.pred not in allowed:
                    raise ValueError(
                        f"edge type {t.pred!r} not admitted for signature"
                        f" ({t.subj_type!r}, {t.obj_type!r}) by the"
                        " edge_type_map")
            compiled.append((t.compile(), t.pred, t.mode,
                             t.subj_type, t.obj_type))
        # Registered templates first (callers refine the defaults), then
        # the builtin patterns with their negation-before-positive order.
        pats = tuple(compiled)
        if self.include_default_templates:
            pats = pats + tuple(rules._PATTERNS)
        object.__setattr__(self, "_patterns", pats)

    @property
    def patterns(self):
        """Compiled (pattern, pred, mode, subj_type, obj_type) tuples in
        match order — the shape :func:`rules._match_templates` consumes."""
        return self._patterns

    def fingerprint(self) -> str:
        """Stable content hash for checkpoint fingerprints."""
        spec = {
            "entity_types": {k: list(v)
                             for k, v in sorted(self.entity_types.items())},
            "excluded": sorted(self.excluded_entity_types),
            "templates": [[t.pattern, t.pred, t.mode, t.subj_type,
                           t.obj_type] for t in self.templates],
            "defaults": self.include_default_templates,
            "functional": sorted(self.functional_preds),
            "sentiment": sorted(self.sentiment_preds),
            "edge_type_map": sorted(
                [list(k) + ["->"] + list(v)
                 for k, v in self.edge_type_map.items()]),
        }
        return rules.stable_id("ontology", json.dumps(spec, sort_keys=True))


#: The built-in rule set as an Ontology (what ``ontology=None`` means).
DEFAULT = Ontology()
