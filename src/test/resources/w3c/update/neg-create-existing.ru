CREATE GRAPH <http://example/g1>
