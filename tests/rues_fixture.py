"""Deterministic RUES-shaped fixture (FIXTURES.md §1-§3): raw CSV with
non-snake headers + every required data pathology + the golden record
matricula 21590, plus the two catalog dims."""

from __future__ import annotations

import csv
from pathlib import Path

# Raw headers exercise RN-010: uppercase-with-spaces (the RUES shape) plus
# one camelCase to hit the case-boundary regexes. NOTE Title-Case-with-space
# headers ("Fecha Matricula") would produce 'fecha__matricula' under the
# reference's exact regex chain — kept as-is for parity, so the fixture uses
# the realistic uppercase form.
RAW_HEADERS = [
    "MATRICULA",
    "NIT",
    "NUMERO IDENTIFICACION",
    "DIGITO VERIFICACION",
    "CLASE IDENTIFICACION",
    "RAZON SOCIAL",
    "PRIMER NOMBRE",
    "SEGUNDO NOMBRE",
    "PRIMER APELLIDO",
    "SEGUNDO APELLIDO",
    "SIGLA",
    "TIPO SOCIEDAD",
    "CODIGO TIPO SOCIEDAD",
    "ORGANIZACION JURIDICA",
    "CODIGO ORGANIZACION JURIDICA",
    "CATEGORIA MATRICULA",
    "CODIGO CATEGORIA MATRICULA",
    "COD CIIU ACT ECON PRI",
    "COD CIIU ACT ECON SEC",
    "CAMARA COMERCIO",
    "CODIGO CAMARA",
    "ESTADO MATRICULA",
    "CODIGO ESTADO MATRICULA",
    "FECHA MATRICULA",
    "FECHA RENOVACION",
    "FECHA VIGENCIA",
    "FECHA CANCELACION",
    "fechaActualizacion",
    "ULTIMO ANO RENOVADO",
]

SNAKE_HEADERS = [
    "matricula", "nit", "numero_identificacion", "digito_verificacion",
    "clase_identificacion", "razon_social", "primer_nombre", "segundo_nombre",
    "primer_apellido", "segundo_apellido", "sigla", "tipo_sociedad",
    "codigo_tipo_sociedad", "organizacion_juridica", "codigo_organizacion_juridica",
    "categoria_matricula", "codigo_categoria_matricula", "cod_ciiu_act_econ_pri",
    "cod_ciiu_act_econ_sec", "camara_comercio", "codigo_camara",
    "estado_matricula", "codigo_estado_matricula", "fecha_matricula",
    "fecha_renovacion", "fecha_vigencia", "fecha_cancelacion",
    "fecha_actualizacion", "ultimo_ano_renovado",
]


def _row(**kw) -> list[str | None]:
    base = {h: None for h in SNAKE_HEADERS}
    base.update(kw)
    return [base[h] for h in SNAKE_HEADERS]


def make_rows() -> list[list[str | None]]:
    rows = [
        # Golden record 21590 (test/query_track_records_validation.sql:18-19)
        _row(
            matricula="21590", nit="900118485", numero_identificacion="900118485",
            digito_verificacion="7", clase_identificacion="NIT",
            razon_social="OPTICA CRISTAL MAGANGUE LTDA.",
            tipo_sociedad="SOCIEDAD LIMITADA", codigo_tipo_sociedad="03",
            organizacion_juridica="SOCIEDAD COMERCIAL", codigo_organizacion_juridica="01",
            categoria_matricula="SOCIEDAD O PERSONA JURIDICA PRINCIPAL O ESAL",
            codigo_categoria_matricula="01",
            cod_ciiu_act_econ_pri="4774", cod_ciiu_act_econ_sec=None,
            camara_comercio="MAGANGUE", codigo_camara="19",
            estado_matricula=" Activa ", codigo_estado_matricula="01",
            fecha_matricula="20061108", fecha_renovacion="20250506",
            fecha_vigencia="20260331", fecha_cancelacion=None,
            fecha_actualizacion="2025/05/13 14:51:55.923000000",
            ultimo_ano_renovado="2025",
        ),
        # Older duplicate of the golden record (RN-002 keeps the one above)
        _row(
            matricula="21590", nit="900118485", numero_identificacion="900118485",
            digito_verificacion="7", clase_identificacion="nit ",
            razon_social="OPTICA CRISTAL MAGANGUE LTDA.",
            tipo_sociedad="SOCIEDAD LIMITADA", codigo_tipo_sociedad="03",
            organizacion_juridica="SOCIEDAD COMERCIAL", codigo_organizacion_juridica="01",
            categoria_matricula="SOCIEDAD O PERSONA JURIDICA PRINCIPAL O ESAL",
            codigo_categoria_matricula="01",
            cod_ciiu_act_econ_pri="4774", camara_comercio="MAGANGUE",
            codigo_camara="19", estado_matricula="RENOVADA",
            codigo_estado_matricula="02",
            fecha_matricula="20061108", fecha_renovacion="20240502",
            fecha_vigencia="20250331",
            fecha_actualizacion="2024/05/02 10:00:00.000000000",
            ultimo_ano_renovado="2024",
        ),
        # Natural person, leading-zero CIIU, pre-1992 date (LEGACY rebase)
        _row(
            matricula="100", nit=None, numero_identificacion="12345678",
            digito_verificacion="1", clase_identificacion="CEDULA DE CIUDADANIA",
            razon_social="PANADERIA EL TRIGAL",
            primer_nombre="MARIA", primer_apellido="GOMEZ",
            tipo_sociedad="PERSONA NATURAL", codigo_tipo_sociedad="01",
            organizacion_juridica="PERSONA NATURAL", codigo_organizacion_juridica="02",
            categoria_matricula="PERSONA NATURAL", codigo_categoria_matricula="02",
            cod_ciiu_act_econ_pri="0111", camara_comercio="BOGOTA",
            codigo_camara="01", estado_matricula="ACTIVA",
            codigo_estado_matricula="01",
            fecha_matricula="19910227", fecha_renovacion="20250301",
            fecha_vigencia="20260301",
            fecha_actualizacion="2025/03/01 08:30:00.000000000",
            ultimo_ano_renovado="2025",
        ),
        # Unknown clase + unknown CIIU -> NULL codigo_identificacion/actividad
        _row(
            matricula="200", nit="800000001", numero_identificacion="800000001",
            digito_verificacion="2", clase_identificacion="SIN IDENTIFICACION",
            razon_social="COMERCIAL XYZ",
            tipo_sociedad="SOCIEDAD ANONIMA", codigo_tipo_sociedad="02",
            organizacion_juridica="SOCIEDAD COMERCIAL", codigo_organizacion_juridica="01",
            categoria_matricula="SOCIEDAD O PERSONA JURIDICA PRINCIPAL O ESAL",
            codigo_categoria_matricula="01",
            cod_ciiu_act_econ_pri="9999", camara_comercio="CALI",
            codigo_camara="03", estado_matricula="cancelada",
            codigo_estado_matricula="03",
            fecha_matricula="20100115", fecha_renovacion="20200110",
            fecha_vigencia="20210110", fecha_cancelacion="20210601",
            fecha_actualizacion="2021/06/01 09:15:30.500000000",
            ultimo_ano_renovado="2020",
        ),
        # Garbage date + future fecha_matricula (negative antiguedad)
        _row(
            matricula="300", nit="800000002", numero_identificacion="800000002",
            digito_verificacion="3", clase_identificacion="NIT",
            razon_social="FUTURO SAS",
            tipo_sociedad="SOCIEDAD POR ACCIONES SIMPLIFICADA",
            codigo_tipo_sociedad="04",
            organizacion_juridica="SOCIEDAD COMERCIAL", codigo_organizacion_juridica="01",
            categoria_matricula="SOCIEDAD O PERSONA JURIDICA PRINCIPAL O ESAL",
            codigo_categoria_matricula="01",
            cod_ciiu_act_econ_pri="4774", camara_comercio="MEDELLIN",
            codigo_camara="02", estado_matricula="SUSPENDIDA",
            codigo_estado_matricula="04",
            fecha_matricula="20990101", fecha_renovacion="not-a-date",
            fecha_vigencia="20260101", fecha_cancelacion=None,
            fecha_actualizacion="2025/01/05 12:00:00.000000000",
            ultimo_ano_renovado="2024",
        ),
        # NULL mandatory fields (matricula / codigo_camara / clase)
        _row(
            matricula=None, nit="800000003", numero_identificacion="800000003",
            digito_verificacion="4", clase_identificacion=None,
            razon_social="ANONIMA LTDA",
            tipo_sociedad="SOCIEDAD LIMITADA", codigo_tipo_sociedad="03",
            organizacion_juridica="SOCIEDAD COMERCIAL", codigo_organizacion_juridica="01",
            categoria_matricula="SOCIEDAD O PERSONA JURIDICA PRINCIPAL O ESAL",
            codigo_categoria_matricula="01",
            cod_ciiu_act_econ_pri="0112", camara_comercio="PASTO",
            codigo_camara=None, estado_matricula="ACTIVA",
            codigo_estado_matricula="01",
            fecha_matricula="20150620", fecha_renovacion="20250115",
            fecha_vigencia="20260115",
            fecha_actualizacion="2025/01/15 16:45:10.100000000",
            ultimo_ano_renovado="2025",
        ),
    ]
    # Bulk rows for aggregate shape (distinct matriculas, two chambers)
    for i in range(50):
        mat = str(1000 + i)
        rows.append(
            _row(
                matricula=mat, nit=f"9005{i:05d}", numero_identificacion=f"9005{i:05d}",
                digito_verificacion=str(i % 10), clase_identificacion="NIT",
                razon_social=f"EMPRESA {mat} SAS",
                tipo_sociedad="SOCIEDAD POR ACCIONES SIMPLIFICADA"
                if i % 2 == 0
                else "SOCIEDAD LIMITADA",
                codigo_tipo_sociedad="04" if i % 2 == 0 else "03",
                organizacion_juridica="SOCIEDAD COMERCIAL",
                codigo_organizacion_juridica="01",
                categoria_matricula="SOCIEDAD O PERSONA JURIDICA PRINCIPAL O ESAL",
                codigo_categoria_matricula="01",
                cod_ciiu_act_econ_pri="0111" if i % 3 == 0 else "4774",
                camara_comercio="BOGOTA" if i % 2 == 0 else "MEDELLIN",
                codigo_camara="01" if i % 2 == 0 else "02",
                estado_matricula="ACTIVA" if i % 4 != 0 else "CANCELADA",
                codigo_estado_matricula="01" if i % 4 != 0 else "03",
                fecha_matricula=f"{2000 + (i % 25):04d}0315",
                fecha_renovacion="20250401",
                fecha_vigencia="20260401",
                fecha_actualizacion=f"2025/04/{(i % 28) + 1:02d} 10:00:00.000000000",
                ultimo_ano_renovado="2025" if i % 4 != 0 else "2023",
            )
        )
    return rows


CAT_IDENTIFICACIONES = [
    ("NIT", "11"),
    ("CEDULA DE CIUDADANIA", "33"),
    ("CEDULA DE EXTRANJERIA", "44"),
    ("PASAPORTE", "55"),
    ("TARJETA DE IDENTIDAD", "66"),
    ("PERMISO POR PROTECCION TEMPORAL", "77"),
    ("PERMISO ESPECIAL DE PERMANENCIA", "88"),
    ("REGISTRO CIVIL DE NACIMIENTO", "99"),
    ("DOCUMENTO EXTRANJERO", "101"),
]

CAT_CIIU = [
    ("0111", "Cultivo de cereales (excepto arroz), legumbres y semillas oleaginosas."),
    ("0112", "Cultivo de arroz."),
    ("4774", "Comercio al por menor de otros productos nuevos en establecimientos especializados."),
]


def write_fixture(base: Path) -> dict[str, str]:
    """Write raw CSV + catalogs under ``base``; returns paths."""
    base.mkdir(parents=True, exist_ok=True)
    raw = base / "rues_empresas.csv"
    with raw.open("w", newline="", encoding="utf-8") as fh:
        w = csv.writer(fh, quoting=csv.QUOTE_MINIMAL)
        w.writerow(RAW_HEADERS)
        w.writerows(make_rows())

    cat_ident = base / "catalogo_clases_identificaciones.csv"
    with cat_ident.open("w", newline="", encoding="utf-8") as fh:
        w = csv.writer(fh)
        w.writerow(["clase_identificacion", "codigo"])
        w.writerows(CAT_IDENTIFICACIONES)

    cat_ciiu = base / "catalogo_codigos_ciuu.csv"
    with cat_ciiu.open("w", newline="", encoding="utf-8") as fh:
        w = csv.writer(fh, quoting=csv.QUOTE_ALL)
        w.writerow(["codigo", "actividad"])
        w.writerows(CAT_CIIU)

    return {
        "raw_csv": str(raw),
        "cat_identificaciones": str(cat_ident),
        "cat_ciiu": str(cat_ciiu),
    }
