"""Typed ontology: entity types, relation types, and (domain, range) constraints.

Semantics follow the reference ontology
(``/root/reference/src/knowledge_graph/foundation/ontology.py:19-133``):
8 entity types with an is-a hierarchy rooted at ENTITY (METHOD ⊂ CONCEPT ⊂
ENTITY implicitly via CONCEPT ⊂ ENTITY), 8 relation types each allowing a set
of (subject_type, object_type) pairs, validated subtype-aware.

In the Spark engine validation is *set-oriented*: ``constraint_rows()``
expands the subtype closure into an explicit allow-list that is broadcast
and inner-joined against candidate edges; rows that fail land in a
quarantine DataFrame instead of raising per-row exceptions.
"""

from __future__ import annotations

from enum import Enum


class EntityType(str, Enum):
    ENTITY = "Entity"
    PERSON = "Person"
    ORGANIZATION = "Organization"
    CONCEPT = "Concept"
    DOCUMENT = "Document"
    CLAIM = "Claim"
    METHOD = "Method"
    DATASET = "Dataset"


# child -> direct parent; ENTITY is the root (reference ontology.py:39-47)
_PARENT: dict[EntityType, EntityType] = {
    EntityType.PERSON: EntityType.ENTITY,
    EntityType.ORGANIZATION: EntityType.ENTITY,
    EntityType.CONCEPT: EntityType.ENTITY,
    EntityType.DOCUMENT: EntityType.ENTITY,
    EntityType.CLAIM: EntityType.ENTITY,
    EntityType.METHOD: EntityType.CONCEPT,
    EntityType.DATASET: EntityType.ENTITY,
}


def ancestors(entity_type: EntityType) -> set[EntityType]:
    chain = {entity_type}
    cur = entity_type
    while cur in _PARENT:
        cur = _PARENT[cur]
        chain.add(cur)
    return chain


def is_subtype(child: EntityType, parent: EntityType) -> bool:
    return parent in ancestors(child)


class RelationType(str, Enum):
    AUTHORED_BY = "AUTHORED_BY"
    CITES = "CITES"
    INSTANCE_OF = "INSTANCE_OF"
    PART_OF = "PART_OF"
    DEFINES = "DEFINES"
    SUPPORTS = "SUPPORTS"
    CONTRADICTS = "CONTRADICTS"
    MENTIONS = "MENTIONS"


# allowed (domain, range) per relation (reference ontology.py:80-109)
_CONSTRAINTS: dict[RelationType, frozenset[tuple[EntityType, EntityType]]] = {
    RelationType.AUTHORED_BY: frozenset(
        {
            (EntityType.DOCUMENT, EntityType.PERSON),
            (EntityType.DOCUMENT, EntityType.ORGANIZATION),
        }
    ),
    RelationType.CITES: frozenset({(EntityType.DOCUMENT, EntityType.DOCUMENT)}),
    RelationType.INSTANCE_OF: frozenset({(EntityType.ENTITY, EntityType.CONCEPT)}),
    RelationType.PART_OF: frozenset(
        {
            (EntityType.CONCEPT, EntityType.CONCEPT),
            (EntityType.DOCUMENT, EntityType.DOCUMENT),
        }
    ),
    RelationType.DEFINES: frozenset({(EntityType.DOCUMENT, EntityType.CONCEPT)}),
    RelationType.SUPPORTS: frozenset(
        {
            (EntityType.DOCUMENT, EntityType.CLAIM),
            (EntityType.CLAIM, EntityType.CLAIM),
        }
    ),
    RelationType.CONTRADICTS: frozenset(
        {
            (EntityType.DOCUMENT, EntityType.CLAIM),
            (EntityType.CLAIM, EntityType.CLAIM),
        }
    ),
    RelationType.MENTIONS: frozenset({(EntityType.DOCUMENT, EntityType.ENTITY)}),
}

ENTITY_TYPES: list[str] = [e.value for e in EntityType]
RELATION_TYPES: list[str] = [r.value for r in RelationType]


def is_valid_relation(
    relation: RelationType, subject_type: EntityType, object_type: EntityType
) -> bool:
    """Subtype-aware validity check (driver-side mirror of the join filter)."""
    return any(
        is_subtype(subject_type, domain) and is_subtype(object_type, range_)
        for domain, range_ in _CONSTRAINTS[relation]
    )


def constraint_rows() -> list[tuple[str, str, str]]:
    """Expand the subtype closure into explicit (predicate, subj_type, obj_type)
    rows for a broadcast allow-list join — the set-oriented analog of the
    reference's per-triple ``validate_relation``.
    """
    rows = []
    for rel, pairs in _CONSTRAINTS.items():
        for domain, range_ in pairs:
            for st in EntityType:
                if not is_subtype(st, domain):
                    continue
                for ot in EntityType:
                    if is_subtype(ot, range_):
                        rows.append((rel.value, st.value, ot.value))
    return sorted(set(rows))
