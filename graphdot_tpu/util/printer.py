"""Markdown table printer (reference: ``graphdot/util/printer.py:5``)."""


class markdown:

    _print_table_header = False

    @classmethod
    def table_start(cls):
        cls._print_table_header = True

    @classmethod
    def table_header(cls, *fields):
        """Print the header row of a Markdown table.

        Parameters
        ----------
        fields: list of (title, format, value) tuples
            Each tuple sets the title, format, and a dummy value for each
            column.
        """
        strs = [fmt % value for _, fmt, value in fields]
        align = ['-' if fmt.startswith('%-') else '' for _, fmt, _ in fields]
        fmts = [f'%{a}{len(s)}s' for a, s in zip(align, strs)]
        header = '|'.join([fmt % f[0] for f, fmt in zip(fields, fmts)])
        sep = '|'.join(['-' * len(s) for s in strs])
        print(f'|{header}|\n|{sep}|')

    @classmethod
    def table(cls, *fields, print_header='auto'):
        """Print a row of data in Markdown table format."""
        if print_header is True or (print_header == 'auto'
                                    and cls._print_table_header is True):
            cls.table_header(*fields)
            cls._print_table_header = False
        line = '|'.join([fmt % value for _, fmt, value in fields])
        print(f'|{line}|')
