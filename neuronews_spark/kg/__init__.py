from neuronews_spark.kg.ontology import (  # noqa: F401
    ENTITY_TYPES,
    RELATION_TYPES,
    EntityType,
    RelationType,
    ancestors,
    constraint_rows,
    is_subtype,
    is_valid_relation,
)
