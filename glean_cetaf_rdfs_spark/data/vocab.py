"""Fixed URI vocabulary for the engine's triple output.

Predicate IRIs mirror the vocabulary the reference emits/grafts
(dwc:institutionID, dcterms:isPartOf/hasPart/conformsTo/publisher,
rdf:type — see convertRDF4import_normal-files_JACQ.sh:440-447 in
/root/reference) plus extraction predicates for the transcript domain.
"""

# --- namespaces -----------------------------------------------------------
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
DCTERMS = "http://purl.org/dc/terms/"
DWC = "http://rs.tdwg.org/dwc/terms/"
DWCIRI = "http://rs.tdwg.org/dwc/iri/"
WGS84 = "http://www.w3.org/2003/01/geo/wgs84_pos#"
PROV = "http://www.w3.org/ns/prov#"
SCHEMA = "http://schema.org/"
XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"

# --- grafted predicates (reference G1-G5) ---------------------------------
P_INSTITUTION_ID = DWC + "institutionID"          # JACQ.sh:440
P_CONFORMS_TO = DCTERMS + "conformsTo"            # JACQ.sh:443
P_IS_PART_OF = DCTERMS + "isPartOf"               # JACQ.sh:444-445
P_HAS_PART = DCTERMS + "hasPart"                  # JACQ.sh:446-447
P_PUBLISHER = DCTERMS + "publisher"               # JACQ.sh:626-627

# --- extraction predicates (transcript domain) ----------------------------
P_MENTIONS = SCHEMA + "mentions"
P_ROLE = SCHEMA + "roleName"
P_USED_TOOL = PROV + "used"
P_CREATED = DCTERMS + "created"
P_LAT = WGS84 + "lat"
P_LONG = WGS84 + "long"
P_RECORDED_BY = DWCIRI + "recordedBy"             # G4 trigger, JACQ.sh:446
P_ASSOCIATED_MEDIA = DWC + "associatedMedia"      # P19 retype, JACQ.sh:846-855

# --- object IRIs -----------------------------------------------------------
O_CSPP = "http://cetafidentifiers.biowikifarm.net/wiki/CSPP"  # generator:132
O_TURN_TYPE = SCHEMA + "Message"
O_CONV_TYPE = SCHEMA + "Conversation"
O_EVENT_TYPE = DWC + "Event"                      # G2 retraction trigger
O_WIKIDATA_ROOT = "http://www.wikidata.org/entity/"
O_VIAF_ROOT = "http://viaf.org/viaf/"

# --- subject URI scheme -----------------------------------------------------
TRANSCRIPT_HOST = "transcripts.example.org"
TOOL_HOST = "tools.example.org"


def conv_uri(conv_id: str) -> str:
    return f"http://{TRANSCRIPT_HOST}/conv/{conv_id}"


def turn_uri(conv_id: str, turn_idx: int) -> str:
    return f"http://{TRANSCRIPT_HOST}/conv/{conv_id}/turn/{turn_idx}"


def tool_uri(tool: str) -> str:
    return f"http://{TOOL_HOST}/{tool}"
