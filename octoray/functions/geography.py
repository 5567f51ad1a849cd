"""Geographic name normalization with edit-distance-1 spell correction.

Semantics of /root/reference/octofludb/domain_geography.py:
  - state_to_code (:62-77): US state name/abbr -> 2-letter postal code
  - country_to_code (:397-409): country name/code -> ISO-3166 alpha-3,
    with article stripping (of/the/and, :388) and Norvig edit-1
    correction (spellcheck.py:7-51)
  - location_to_country_code (:473-483): adds Canadian/Chinese
    provinces and falls back to USA for US states

The expanded edit-1 dictionaries (~1e6 keys) are built lazily ONCE per
worker process (module-level cache) — never per batch.  At cluster
scale this is the "broadcast lexicon" of the north rule: each worker
pays the build cost once; batches do O(1) dict lookups per value.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

from octoray.functions.spellcheck import make_wordfinder

STATE_NAME2ABBR: Dict[str, str] = {
    "alaska": "AK", "alabama": "AL", "arkansas": "AR", "arizona": "AZ",
    "california": "CA", "colorado": "CO", "connecticut": "CT",
    "district_of_columbia": "DC", "delaware": "DE", "florida": "FL",
    "georgia": "GA", "hawaii": "HI", "iowa": "IA", "idaho": "ID",
    "illinois": "IL", "indiana": "IN", "kansas": "KS", "kentucky": "KY",
    "louisiana": "LA", "massachusetts": "MA", "maryland": "MD",
    "maine": "ME", "michigan": "MI", "minnesota": "MN", "missouri": "MO",
    "mississippi": "MS", "montana": "MT", "north_carolina": "NC",
    "north_dakota": "ND", "nebraska": "NE", "new_hampshire": "NH",
    "new_jersey": "NJ", "new_mexico": "NM", "nevada": "NV",
    "new_york": "NY", "ohio": "OH", "oklahoma": "OK", "oregon": "OR",
    "pennsylvania": "PA", "rhode_island": "RI", "south_carolina": "SC",
    "south_dakota": "SD", "tennessee": "TN", "texas": "TX", "utah": "UT",
    "virginia": "VA", "vermont": "VT", "washington": "WA",
    "wisconsin": "WI", "west_virginia": "WV", "wyoming": "WY",
}
STATE_ABBR = set(STATE_NAME2ABBR.values())

COUNTRY_3LETTER_CODES: Dict[str, Optional[str]] = {
    "afghanistan": "AFG", "aland_islands": "ALA", "albania": "ALB",
    "algeria": "DZA", "american_samoa": "ASM", "andorra": "AND",
    "angola": "AGO", "anguilla": "AIA", "antarctica": "ATA",
    "antigua_barbuda": "ATG", "argentina": "ARG", "armenia": "ARM",
    "aruba": "ABW", "australia": "AUS", "austria": "AUT",
    "azerbaijan": "AZE", "bahamas": "BHS", "bahrain": "BHR",
    "bangladesh": "BGD", "barbados": "BRB", "belarus": "BLR",
    "belgium": "BEL", "belize": "BLZ", "benin": "BEN", "bermuda": "BMU",
    "bhutan": "BTN", "bolivia": "BOL",
    "bonaire,_sint_eustatius_saba": "BES", "bonaire": "BES",
    "bosnia_herzegovina": "BIH", "botswana": "BWA",
    "bouvet_island": "BVT", "brazil": "BRA",
    "british_indian_ocean_territory": "IOT", "brunei_darussalam": "BRN",
    "bulgaria": "BGR", "burkina_faso": "BFA", "burundi": "BDI",
    "cambodia": "KHM", "cameroon": "CMR", "canada": "CAN",
    "cape_verde": "CPV", "cayman_islands": "CYM",
    "central_african_republic": "CAF", "chad": "TCD", "chile": "CHL",
    "china": "CHN", "prc": "CHN", "christmas_island": "CXR",
    "cocos_islands": "CCK", "cocos_(keeling)_islands": "CCK",
    "colombia": "COL", "comoros": "COM", "congo": "COG",
    "republic_congo": "COG", "congo,_democratic_republic": "COD",
    "democratic_republic_congo": "COD", "dr_congo": "COD", "drc": "COD",
    "droc": "COD", "cook_islands": "COK", "costa_rica": "CRI",
    "cote_d'ivoire": "CIV", "cote_divoire": "CIV", "croatia": "HRV",
    "cuba": "CUB", "curaçao": "CUW", "cyprus": "CYP", "czechia": "CZE",
    "czech_republic": "CZE", "czechoslovakia": None, "denmark": "DNK",
    "djibouti": "DJI", "dominica": "DMA", "dominican_republic": "DOM",
    "ecuador": "ECU", "egypt": "EGY", "el_salvador": "SLV",
    "equatorial_guinea": "GNQ", "eritrea": "ERI", "estonia": "EST",
    "ethiopia": "ETH", "europe": None,
    "falkland_islands_(malvinas)": "FLK", "falkland_islands": "FLK",
    "faroe_islands": "FRO", "fiji": "FJI", "finland": "FIN",
    "france": "FRA", "french_guiana": "GUF", "french_polynesia": "PYF",
    "french_southern_territories": "ATF", "gabon": "GAB",
    "gambia": "GMB", "gaza_strip": None, "georgia": "GEO",
    "germany": "DEU", "ghana": "GHA", "gibraltar": "GIB",
    "greece": "GRC", "greenland": "GRL", "grenada": "GRD",
    "guadeloupe": "GLP", "guam": "GUM", "guatemala": "GTM",
    "guernsey": "GGY", "guinea": "GIN", "guinea-bissau": "GNB",
    "guyana": "GUY", "haiti": "HTI", "heard_mc_donald_islands": "HMD",
    "holy_see_(vatican_city_state)": "VAT", "vatican_city_state": "VAT",
    "vatican_city": "VAT", "honduras": "HND", "hong_kong": "HKG",
    "hungary": "HUN", "iceland": "ISL", "india": "IND",
    "indonesia": "IDN", "iran": "IRN", "iran,_islamic_republic": "IRN",
    "islamic_republic_iran": "IRN", "iraq": "IRQ", "ireland": "IRL",
    "isle_man": "IMN", "israel": "ISR", "italy": "ITA", "jamaica": "JAM",
    "japan": "JPN", "jersey": "JEY", "jordan": "JOR", "kazakhstan": "KAZ",
    "kenya": "KEN", "kiribati": "KIR", "north_korea": "PRK",
    "korea,_democratic_people's_republic": "PRK",
    "democratic_people's_republic_korea": "PRK", "south_korea": "KOR",
    "korea": "KOR", "republic_korea": "KOR", "kosovo": None,
    "kuwait": "KWT", "kyrgyzstan": "KGZ", "lab": None, "laos": "LAO",
    "lao_people's_democratic_republic": "LAO", "latvia": "LVA",
    "lebanon": "LBN", "lesotho": "LSO", "liberia": "LBR",
    "libya": "LBY", "state_libya": "LBY", "liechtenstein": "LIE",
    "lithuania": "LTU", "luxembourg": "LUX", "macao": "MAC",
    "macau": "MAC", "north_macedonia": "MKD", "madagascar": "MDG",
    "malawi": "MWI", "malaysia": "MYS", "maldives": "MDV", "mali": "MLI",
    "malta": "MLT", "marshall_islands": "MHL", "martinique": "MTQ",
    "mauritania": "MRT", "mauritius": "MUS", "mayotte": "MYT",
    "mexico": "MEX", "micronesia,_federated_states": "FSM",
    "federated_states_micronesia": "FSM", "micronesia": "FSM",
    "middle_east": None, "moldova": "MDA", "republic_moldova": "MDA",
    "monaco": "MCO", "mongolia": "MNG", "montenegro": "MNE",
    "montserrat": "MSR", "morocco": "MAR", "mozambique": "MOZ",
    "myanmar": "MMR", "namibia": "NAM", "nauru": "NRU", "nepal": "NPL",
    "netherlands": "NLD", "new_caledonia": "NCL", "new_zealand": "NZL",
    "nicaragua": "NIC", "niger": "NER", "nigeria": "NGA", "niue": "NIU",
    "norfolk_island": "NFK", "northern_mariana_islands": "MNP",
    "norway": "NOR", "oman": "OMN", "pakistan": "PAK", "palau": "PLW",
    "palestinian_territory,_occupied": "PSE",
    "occupied_palestinian_territory": "PSE", "palestine": "PSE",
    "state_palestine": "PSE", "panama": "PAN",
    "papua_new_guinea": "PNG", "paraguay": "PRY", "peru": "PER",
    "philippines": "PHL", "pitcairn": "PCN", "poland": "POL",
    "portugal": "PRT", "puerto_rico": "PRI", "qatar": "QAT",
    "republic_serbia": "SRB", "serbia": "SRB", "reunion": "REU",
    "romania": "ROU", "russia_federation": "RUS", "russia": "RUS",
    "ussr": "RUS", "rwanda": "RWA", "saint_barthélemy": "BLM",
    "saint_helena": "SHN", "saint_kitts_nevis": "KNA",
    "saint_lucia": "LCA", "saint_martin": "MAF",
    "saint_pierre_miquelon": "SPM", "saint_vincent_grenadines": "VCT",
    "samoa": "WSM", "san_marino": "SMR", "sao_tome_principe": "STP",
    "saudi_arabia": "SAU", "senegal": "SEN", "seychelles": "SYC",
    "sierra_leone": "SLE", "singapore": "SGP", "sint_maarten": "SXM",
    "slovakia": "SVK", "slovenia": "SVN", "solomon_islands": "SLB",
    "somalia": "SOM", "south_africa": "ZAF",
    "south_georgia_south_sandwich_islands": "SGS", "south_sudan": "SSD",
    "spain": "ESP", "sri_lanka": "LKA", "sudan": "SDN",
    "suriname": "SUR", "svalbard_jan_mayen": "SJM", "swaziland": "SWZ",
    "sweden": "SWE", "switzerland": "CHE", "syrian_arab_republic": "SYR",
    "syria": "SYR", "taiwan": "TWN", "tajikistan": "TJK",
    "tanzania,_united_republic": "TZA", "thailand": "THA",
    "timor-leste": "TLS", "togo": "TGO", "tokelau": "TKL",
    "tonga": "TON", "trinidad_tobago": "TTO", "tunisia": "TUN",
    "turkey": "TUR", "northern_cyprus": None, "turkmenistan": "TKM",
    "turks_caicos_islands": "TCA", "tuvalu": "TUV", "uganda": "UGA",
    "ukraine": "UKR", "united_arab_emirates": "ARE",
    "united_kingdom": "GBR", "united_kingdom_of_great_britain": "GBR",
    "uk": "GBR", "britain": "GBR", "england": "GBR",
    "united_states_minor_outlying_islands": "UMI",
    "united_states": "USA", "united_states_america": "USA", "us": "USA",
    "america": "USA", "gringoland": "USA", "uruguay": "URY",
    "uzbekistan": "UZB", "vanuatu": "VUT", "venezuela": "VEN",
    "viet_nam": "VNM", "vietnam": "VNM", "virgin_islands,_british": "VGB",
    "british_virgin_islands": "VGB", "virgin_islands,_u.s.": "VIR",
    "u.s._virgin_islands": "VIR", "united_states_virgin_islands": "VIR",
    "us_virgin_islands": "VIR", "american_virgin_islands": "VIR",
    "wallis_futuna": "WLF", "west_bank": None, "western_sahara": "ESH",
    "yemen": "YEM", "zambia": "ZMB", "zimbabwe": "ZWE",
}
COUNTRY_NAMES = set(COUNTRY_3LETTER_CODES.keys())
COUNTRY_ABBREVIATIONS = {c for c in COUNTRY_3LETTER_CODES.values() if c}

LOCATIONS_IN: Dict[str, str] = {
    # Canadian territories (domain_geography.py:412-424)
    "ontario": "CAN", "quebec": "CAN", "nova_scotia": "CAN",
    "new_brunswick": "CAN", "manitoba": "CAN", "british_columbia": "CAN",
    "prince_edward_island": "CAN", "saskatchewan": "CAN",
    "alberta": "CAN", "newfoundland": "CAN",
    "newfoundland_and_labrador": "CAN",
    # Chinese provinces (domain_geography.py:425-455)
    "anhui": "CHN", "beijing": "CHN", "chongqing": "CHN", "fujian": "CHN",
    "guangdong": "CHN", "gansu": "CHN", "guangxi": "CHN",
    "guizhou": "CHN", "henan": "CHN", "hubei": "CHN", "hebei": "CHN",
    "hainan": "CHN", "heilongjiang": "CHN", "hong_kong": "CHN",
    "hunan": "CHN", "jilin": "CHN", "jiangsu": "CHN", "jiangxi": "CHN",
    "liaoning": "CHN", "macau": "CHN", "qinghai": "CHN",
    "sichuan": "CHN", "shandong": "CHN", "shanghai": "CHN",
    "shaanxi": "CHN", "shanxi": "CHN", "tianjin": "CHN", "tibet": "CHN",
    "yunnan": "CHN", "zhejiang": "CHN",
}

_clean_name = re.compile("of_|the_|and_|_of|_the|_and")

# lazy once-per-worker edit-1 dictionaries (X3 in SURVEY §2.9)
_state_correction = None
_country_correction = None


def _corrections():
    global _state_correction, _country_correction
    if _state_correction is None:
        _state_correction = make_wordfinder(STATE_NAME2ABBR.keys())
        _country_correction = make_wordfinder(COUNTRY_NAMES)
    return _state_correction, _country_correction


def state_to_code(name) -> Optional[str]:
    """US state name or postal abbr -> 2-letter code, edit-1 corrected
    (domain_geography.py:62-77)."""
    try:
        name = name.strip()
    except AttributeError:
        return None
    if name.upper() in STATE_ABBR:
        return name.upper()
    name = name.lower().replace(" ", "_")
    state_corr, _ = _corrections()
    name = state_corr(name)
    if name is None:
        return None
    return STATE_NAME2ABBR.get(name)


def country_to_code(name) -> Optional[str]:
    """Country name/code -> ISO alpha-3 (domain_geography.py:397-409)."""
    try:
        name = name.strip()
    except AttributeError:
        return None
    if name.upper() in COUNTRY_ABBREVIATIONS:
        return name.upper()
    name = name.lower().strip().replace(" ", "_")
    name = _clean_name.sub("", name)
    _, country_corr = _corrections()
    name = country_corr(name)
    if name is None:
        return None
    if name in COUNTRY_NAMES:
        return COUNTRY_3LETTER_CODES[name]
    return None


def location_to_country_code(name) -> Optional[str]:
    """Country, province, or US state -> country code
    (domain_geography.py:473-483)."""
    code = country_to_code(name)
    if not code:
        try:
            code = LOCATIONS_IN[name.strip().lower()]
        except (KeyError, AttributeError):
            code = "USA" if state_to_code(name) else None
    return code


def make_country_uri(country_str: str) -> str:
    """nomenclature.py:80-86: known country -> world:<code>, else mint
    from the raw string in the world namespace."""
    from octoray.model import make_uri

    code = country_to_code(country_str)
    if code:
        return "world:" + code
    return make_uri(country_str, prefix="world")
