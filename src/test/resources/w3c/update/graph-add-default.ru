ADD DEFAULT TO GRAPH <http://example/g1>
