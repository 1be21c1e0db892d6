MOVE GRAPH <http://example/no-such> TO DEFAULT
