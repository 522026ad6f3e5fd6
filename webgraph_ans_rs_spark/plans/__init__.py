from .derived_graph import (
    CLUSTER_GROUP,
    HASH_MULT,
    HASH_STEP,
    LOCAL_LINKS,
    clustered_edges,
    clustered_edges_sql,
    hash_edges,
    hash_edges_sql,
    undirected_sql,
    undirected_symmetrize,
    vertices,
    vertices_sql,
)

__all__ = [
    "CLUSTER_GROUP",
    "HASH_MULT",
    "HASH_STEP",
    "LOCAL_LINKS",
    "clustered_edges",
    "clustered_edges_sql",
    "hash_edges",
    "hash_edges_sql",
    "undirected_sql",
    "undirected_symmetrize",
    "vertices",
    "vertices_sql",
]
