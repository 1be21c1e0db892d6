PREFIX : <http://example/>
DELETE WHERE { ?s :noSuchProp ?o }
