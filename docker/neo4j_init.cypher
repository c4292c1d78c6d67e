// Schema bootstrap for the optional Neo4j backend.
// Mirrors what Neo4jGraphStore.create_indexes() ensures at runtime.
CREATE CONSTRAINT entity_name_uuid IF NOT EXISTS
FOR (e:Entity) REQUIRE (e.name, e.graph_uuid) IS UNIQUE;

CREATE CONSTRAINT chunk_id_uuid IF NOT EXISTS
FOR (c:Chunk) REQUIRE (c.id, c.graph_uuid) IS UNIQUE;

CREATE FULLTEXT INDEX entityName IF NOT EXISTS
FOR (e:Entity) ON EACH [e.name];

CREATE INDEX graph_uuid_node IF NOT EXISTS
FOR (n:GraphNode) ON (n.graph_uuid);
