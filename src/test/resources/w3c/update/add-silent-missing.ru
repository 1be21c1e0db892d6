ADD SILENT GRAPH <http://example/no-such> TO GRAPH <http://example/g1>
