PREFIX : <http://example/>
DELETE WHERE { ?s :type :Widget . ?s :price ?v . }
