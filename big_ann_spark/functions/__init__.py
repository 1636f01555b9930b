from big_ann_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_distance,
    l2_normalize,
    sq_l2_distance,
    to_elasticsearch_vector,
    to_solr_vector,
)
