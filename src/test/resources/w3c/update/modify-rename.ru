PREFIX : <http://example/>
DELETE { ?s :p ?o } INSERT { ?s :renamed ?o } WHERE { ?s :p ?o }
