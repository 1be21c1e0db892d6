CLEAR GRAPH <http://example/g1>
