PREFIX : <http://example/>
DELETE WHERE { ?s :p/:q ?o }
