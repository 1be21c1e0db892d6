PREFIX : <http://example/>
DELETE WHERE { GRAPH ?g { ?s :in ?o } }
