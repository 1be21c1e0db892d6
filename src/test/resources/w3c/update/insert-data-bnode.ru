PREFIX : <http://example/>
INSERT DATA { _:n :p 1 . _:n :q "shared" . [ :anon 2 ] }
