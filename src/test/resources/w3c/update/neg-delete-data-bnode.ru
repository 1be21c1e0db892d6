PREFIX : <http://example/>
DELETE DATA { _:b :p 1 }
