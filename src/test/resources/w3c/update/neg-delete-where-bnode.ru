PREFIX : <http://example/>
DELETE WHERE { ?s :tag [ :v ?o ] }
